import time
import numpy as np
from mymedialite_tpu.data.synthetic import (
    split_posonly, split_ratings, synthetic_posonly, synthetic_ratings)
from mymedialite_tpu.data.arrays import PosOnlyData
from mymedialite_tpu.eval import evaluate_items, evaluate_ratings
from mymedialite_tpu.models.registry import (
    create_item_recommender, create_rating_predictor)
from mymedialite_tpu.utils.params import configure

data, (P_true, _q, _bu, _bi) = synthetic_ratings(
    num_users=6040, num_items=3706, num_ratings=1_000_000, seed=100,
    return_factors=True)
train, test = split_ratings(data, 0.1, seed=101)
Pn = P_true / np.maximum(np.linalg.norm(P_true, axis=1, keepdims=True), 1e-9)
sim = Pn @ Pn.T; np.fill_diagonal(sim, -np.inf)
nbr = np.argpartition(-sim, 10, axis=1)[:, :10]
trust = PosOnlyData(np.repeat(np.arange(6040, dtype=np.int32), 10),
                    nbr.astype(np.int32).reshape(-1), num_users=6040, num_items=6040)
m = create_rating_predictor("SocialMF")
configure(m, "num_factors=40 num_iter=400 learn_rate=0.0002 social_regularization=0.5")
m.user_relation = trust
m.ratings = train
t0 = time.time(); m.train(); t = time.time() - t0
print(f"SocialMF {evaluate_ratings(m, test)} train {t:.1f}s", flush=True)

pos = synthetic_posonly(num_users=6040, num_items=3706, num_events=500_000, seed=102)
ptrain, ptest = split_posonly(pos, 0.2, seed=103)
for name, opts in [("LeastSquareSLIM", "num_iter=10 reg_l1=0.0001 k=100"),
                   ("BPRSLIM", "num_iter=30")]:
    m = create_item_recommender(name)
    configure(m, opts)
    m.feedback = ptrain
    t0 = time.time(); m.train(); t_train = time.time() - t0
    t0 = time.time(); r = evaluate_items(m, ptest, ptrain); t_eval = time.time() - t0
    print(f"{name} {r} train {t_train:.1f}s eval {t_eval:.1f}s", flush=True)
