"""SVD++ family tests (counterpart of reference Tests/RatingPrediction/
SVDPlusPlusTest.cs and Sigmoid*Test.cs smoke tests + quality sanity)."""

import numpy as np
import pytest

from mymedialite_tpu.data import RatingData
from mymedialite_tpu.data.synthetic import split_ratings, synthetic_ratings
from mymedialite_tpu.eval.rating import evaluate_ratings
from mymedialite_tpu.models.registry import create_rating_predictor

SVDPP_NAMES = [
    "SVDPlusPlus", "SigmoidSVDPlusPlus", "SigmoidItemAsymmetricFactorModel",
    "SigmoidUserAsymmetricFactorModel",
    "SigmoidCombinedAsymmetricFactorModel",
]


def small_ratings():
    users = [0, 0, 0, 1, 1, 1, 2, 3, 4]
    items = [0, 1, 2, 0, 1, 3, 0, 0, 1]
    values = [1.0, 1.5, 3.0, 5.0, 3.5, 1.0, 4.0, 2.0, 4.5]
    return RatingData(users, items, values)


@pytest.fixture(scope="module")
def ml_like():
    data = synthetic_ratings(num_ratings=30000, seed=3)
    return split_ratings(data, seed=4)


class TestSVDPlusPlus:
    @pytest.mark.parametrize("name", SVDPP_NAMES)
    def test_smoke(self, name):
        m = create_rating_predictor(name)
        m.ratings = small_ratings()
        m.num_iter = 2
        m.group_users = 4
        m.train()
        p = m.predict(0, 0)
        assert np.isfinite(p)
        assert m.min_rating <= p <= m.max_rating

    def test_learns(self, ml_like):
        train, test = ml_like
        m = create_rating_predictor("SVDPlusPlus")
        m.ratings = train
        m.num_factors = 8
        m.num_iter = 20
        m.learn_rate = 0.005
        m.train()
        ga = create_rating_predictor("GlobalAverage")
        ga.ratings = train
        ga.train()
        rmse = evaluate_ratings(m, test)["RMSE"]
        rmse_ga = evaluate_ratings(ga, test)["RMSE"]
        assert rmse < rmse_ga - 0.03

    def test_transductive_additional_feedback(self, ml_like):
        train, test = ml_like
        m = create_rating_predictor("SVDPlusPlus")
        m.ratings = train
        m.num_iter = 3
        m.additional_feedback = (test.users, test.items)
        m.train()
        assert np.isfinite(m.predict(int(test.users[0]), int(test.items[0])))

    @pytest.mark.parametrize("name", ["SVDPlusPlus", "SigmoidSVDPlusPlus"])
    def test_save_load(self, name, tmp_path):
        m = create_rating_predictor(name)
        m.ratings = small_ratings()
        m.num_iter = 2
        m.group_users = 4
        m.train()
        users = np.array([0, 1, 2, 3])
        items = np.array([0, 1, 2, 3])
        before = m.predict_batch(users, items)
        path = str(tmp_path / "svdpp.model")
        m.save_model(path)
        m2 = create_rating_predictor(name)
        m2.ratings = small_ratings()
        m2.group_users = 4
        m2.load_model(path)
        np.testing.assert_allclose(before, m2.predict_batch(users, items),
                                   atol=1e-5)

    def test_incremental(self, ml_like):
        train, _ = ml_like
        m = create_rating_predictor("SVDPlusPlus")
        m.ratings = train
        m.num_iter = 2
        m.train()
        new_u = train.num_users
        m.add_ratings([new_u], [0], [4.0])
        assert np.isfinite(m.predict(new_u, 1))


class TestShardedSVDPP:
    """Mesh-sharded SVD++ epochs (ops/svdpp.py svdpp_epoch_sharded):
    user slabs row-sharded over the 8-device CPU mesh, item-side deltas
    psum'd at each group boundary (reference SVDPlusPlus.cs:157-213 under
    the DSGD schedule of MultiCore.cs:43-73)."""

    def test_sharded_path_engages(self, ml_like):
        import jax
        assert len(jax.devices()) >= 8  # conftest virtual mesh
        train, _ = ml_like
        m = create_rating_predictor("SVDPlusPlus")
        m.ratings = train
        m.num_iter = 1
        m.group_users = 64  # several groups per device
        m.train()
        assert m._mesh is not None and m._mesh.devices.size >= 8
        assert m._meta["ngroups"] % 8 == 0

    def test_sharded_matches_single_device_on_disjoint_blocks(self):
        """When each user group touches a disjoint item block, the
        sequential epoch and the sharded epoch (whose psum merges
        non-overlapping deltas) apply identical updates — same standard
        as TestShardedALS."""
        import jax
        import jax.numpy as jnp

        from mymedialite_tpu.ops import svdpp as ops
        from mymedialite_tpu.parallel.mesh import (
            make_mesh, replicated, row_sharded, row_sharded_2d,
        )

        n = len(jax.devices())
        G, IB, f = 8, 10, 4
        U, I = G * n, IB * n
        rng = np.random.default_rng(1)
        users, items, values = [], [], []
        for u in range(U):
            g = u // G
            for _ in range(6):
                users.append(u)
                items.append(g * IB + int(rng.integers(0, IB)))
                values.append(float(rng.uniform(1, 5)))
        ratings = RatingData(users, items, values, num_users=U, num_items=I)
        hu = np.asarray(users, np.int32)
        hi = np.asarray(items, np.int32)
        data, meta = ops.prepare_groups(ratings, hu, hi, U, I, G,
                                        pad_groups_multiple=n)
        assert meta["ngroups"] == n

        key = jax.random.PRNGKey(0)
        q = 0.1 * jax.random.normal(key, (I, f), dtype=jnp.float32)

        def fresh_params():
            return dict(global_bias=jnp.float32(3.0),
                        user_bias=jnp.zeros(U, jnp.float32),
                        item_bias=jnp.zeros(I, jnp.float32),
                        item_factors=jnp.array(q),
                        y=0.05 * jnp.ones((I, f), jnp.float32),
                        p=0.1 * jnp.ones((U, f), jnp.float32))

        hp = dict(learn_rate=jnp.float32(0.01),
                  bias_learn_rate=jnp.float32(1.0),
                  bias_reg=jnp.float32(0.33),
                  min_rating=jnp.float32(1.0),
                  rating_range=jnp.float32(4.0),
                  user_reg=jnp.full(U, 0.015, jnp.float32),
                  item_reg=jnp.full(I, 0.015, jnp.float32),
                  y_reg=jnp.full(I, 0.015, jnp.float32))
        kw = dict(group_users=G, ngroups=meta["ngroups"], loss=0,
                  sigmoid=False, use_p=True, update_user=True,
                  update_item=True)
        single = ops.svdpp_epoch(fresh_params(), data, hp, **kw)

        mesh = make_mesh()
        rep = replicated(mesh)
        sh1, sh2 = row_sharded(mesh), row_sharded_2d(mesh)
        sp = fresh_params()
        sp = dict(global_bias=jax.device_put(sp["global_bias"], rep),
                  user_bias=jax.device_put(sp["user_bias"], sh1),
                  item_bias=jax.device_put(sp["item_bias"], rep),
                  item_factors=jax.device_put(sp["item_factors"], rep),
                  y=jax.device_put(sp["y"], rep),
                  p=jax.device_put(sp["p"], sh2))
        sd = {k: jax.device_put(data[k], sh2)
              for k in ("r_user", "r_item", "r_value", "r_mask",
                        "e_user", "e_item", "e_mask")}
        sd["inv_sqrt_hist"] = jax.device_put(data["inv_sqrt_hist"], sh1)
        shp = dict(hp, user_reg=jax.device_put(hp["user_reg"], sh1),
                   item_reg=jax.device_put(hp["item_reg"], rep),
                   y_reg=jax.device_put(hp["y_reg"], rep))
        sharded = ops.svdpp_epoch_sharded(mesh, sp, sd, shp, **kw)

        for name in ("user_bias", "item_bias", "item_factors", "y", "p"):
            np.testing.assert_allclose(np.asarray(single[name]),
                                       np.asarray(sharded[name]),
                                       atol=1e-6, err_msg=name)
