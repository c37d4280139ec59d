import time
import numpy as np
import jax.numpy as jnp
from mymedialite_tpu.data.synthetic import synthetic_posonly, split_posonly
from mymedialite_tpu.models.slim import BPRSLIM

pos = synthetic_posonly(num_users=6040, num_items=3706, num_events=500_000, seed=102)
ptrain, ptest = split_posonly(pos, 0.2, seed=103)
m = BPRSLIM()
m.num_iter = 1
m.feedback = ptrain
t0 = time.time(); m.train(); print("train1", time.time()-t0, flush=True)
sc = m.catalog_scorer()
print("scorer engaged:", sc is not None, flush=True)
u = np.arange(256, dtype=np.int32)
t0 = time.time()
s = m.score_catalog_device(u)
print("score 256 (compile):", time.time()-t0, flush=True)
t0 = time.time()
for _ in range(5):
    s = m.score_catalog_device(u)
print("score 256 x5:", time.time()-t0, flush=True)
float(jnp.sum(s[0]))
from mymedialite_tpu.eval import evaluate_items
t0 = time.time()
r = evaluate_items(m, ptest, ptrain)
print("eval:", time.time()-t0, r["AUC"], flush=True)
