"""Full-catalog top-K retrieval kernel tests."""

import numpy as np
import jax.numpy as jnp

from mymedialite_tpu.data.synthetic import split_posonly, synthetic_posonly
from mymedialite_tpu.models.registry import create_item_recommender
from mymedialite_tpu.ops.topk import recommend_batch, topk_from_factors


class TestTopKKernel:
    def test_matches_argsort(self):
        rng = np.random.default_rng(0)
        W = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
        H = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
        ignore = jnp.full((8, 2), 50, dtype=jnp.int32)  # out-of-range pad
        mask = jnp.ones(50, dtype=jnp.float32)
        ids, scores = topk_from_factors(W, H, ignore, mask, k=5)
        full = np.asarray(W @ H.T)
        expect = np.argsort(-full, axis=1)[:, :5]
        np.testing.assert_array_equal(np.asarray(ids), expect)

    def test_ignore_and_candidates(self):
        rng = np.random.default_rng(1)
        W = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        H = jnp.asarray(rng.normal(size=(20, 8)).astype(np.float32))
        full = np.asarray(W @ H.T)
        best = np.argmax(full, axis=1)
        ignore = jnp.asarray(best[:, None].astype(np.int32))
        mask = jnp.ones(20, dtype=jnp.float32)
        ids, _ = topk_from_factors(W, H, ignore, mask, k=3)
        for r in range(4):
            assert best[r] not in np.asarray(ids[r])

    def test_recommend_batch_vs_recommend(self):
        data = synthetic_posonly(num_events=4000, num_users=100,
                                 num_items=150, seed=2)
        train, _ = split_posonly(data)
        m = create_item_recommender("BPRMF")
        m.feedback = train
        m.num_iter = 3
        m.batch_size = 1024
        m.train()
        users = np.array([0, 1, 2, 3], dtype=np.int32)
        ids, scores = recommend_batch(m, users, 5, training=train)
        for r, u in enumerate(users):
            ignore = train.items_by_user(int(u)) if u < train.num_users else []
            expect = [i for i, _ in m.recommend(int(u), n=5,
                                                ignore_items=ignore)]
            assert list(ids[r][:len(expect)]) == expect
