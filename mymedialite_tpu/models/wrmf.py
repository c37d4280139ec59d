"""WRMF — weighted regularized matrix factorization (implicit ALS).

TPU-native counterpart of reference ``ItemRecommendation/WRMF.cs:53-180``
(Hu/Koren/Volinsky 2008). Alternation solves every user row then every
item row in closed form; here each side is one batched-solve call
(ops/als.py) instead of a Parallel.For + per-row matrix inverse.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mymedialite_tpu.data.arrays import padded_history
from mymedialite_tpu.models.bpr import ItemMF
from mymedialite_tpu.ops.als import pad_rows, wrmf_optimize


class WRMF(ItemMF):
    HYPERPARAMS = {
        "num_factors": int,
        "regularization": float,
        "alpha": float,
        "num_iter": int,
    }
    EXTRA_PARAMS = dict(ItemMF.EXTRA_PARAMS, solve_chunk=int)

    def __init__(self):
        super().__init__()
        # defaults per reference WRMF.cs:56-65
        self.alpha = 1.0
        self.regularization = 0.015
        self.num_iter = 15
        self.solve_chunk = 256
        self._user_hist = None
        self._item_hist = None

    def init_model(self):
        super().init_model()
        self._mesh = self._make_mesh()
        self._build_histories()

    def _make_mesh(self):
        """Row solves are embarrassingly parallel (reference Parallel.For,
        WRMF.cs:87-91): shard them over the mesh when devices > 1."""
        import jax
        if len(jax.devices()) <= 1:
            return None
        from mymedialite_tpu.parallel.mesh import make_mesh
        return make_mesh()

    def _build_histories(self):
        import jax
        from mymedialite_tpu.parallel.mesh import replicated, row_sharded, \
            row_sharded_2d

        f = self.feedback
        mult = self.solve_chunk * (self._mesh.devices.size
                                   if self._mesh is not None else 1)
        uh, ul = padded_history(f.by_user)
        ih, il = padded_history(f.by_item)
        uh, ul, _ = pad_rows(uh, ul, mult)
        ih, il, _ = pad_rows(ih, il, mult)
        if self._mesh is not None:
            sh2, sh1 = row_sharded_2d(self._mesh), row_sharded(self._mesh)
            self._user_hist = (jax.device_put(uh, sh2),
                               jax.device_put(ul, sh1))
            self._item_hist = (jax.device_put(ih, sh2),
                               jax.device_put(il, sh1))
        else:
            self._user_hist = (jnp.asarray(uh), jnp.asarray(ul))
            self._item_hist = (jnp.asarray(ih), jnp.asarray(il))

    def _optimize(self, H, hist, lens, alpha, reg):
        if self._mesh is None:
            return wrmf_optimize(H, hist, lens, alpha, reg,
                                 chunk=self.solve_chunk)
        import jax
        from mymedialite_tpu.ops.als import wrmf_optimize_sharded
        from mymedialite_tpu.parallel.mesh import replicated
        H_rep = jax.device_put(np.asarray(H), replicated(self._mesh))
        W = wrmf_optimize_sharded(self._mesh, H_rep, hist, lens, alpha,
                                  reg, chunk=self.solve_chunk)
        return jnp.asarray(np.asarray(W))

    def iterate(self):
        """One alternation (reference WRMF.Iterate :68-73)."""
        p = self.params
        alpha = jnp.float32(self.alpha)
        reg = jnp.float32(self.regularization)
        uh, ul = self._user_hist
        W = self._optimize(p["item_factors"], uh, ul, alpha, reg)
        p["user_factors"] = W[:p["user_factors"].shape[0]]
        ih, il = self._item_hist
        H = self._optimize(p["user_factors"], ih, il, alpha, reg)
        p["item_factors"] = H[:p["item_factors"].shape[0]]

    def _retrain(self, users, items):
        """Re-solve the touched rows (reference RetrainUser/RetrainItem
        :160-172) — done by refreshing histories and re-solving both sides
        once for simplicity and determinism."""
        if self.params is None:
            return
        self._grow_tables()
        self._build_histories()
        self.iterate()

    def _grow_tables(self):
        f = self.feedback
        p = self.params
        for side, n in (("user_factors", f.num_users),
                        ("item_factors", f.num_items)):
            grow = n - p[side].shape[0]
            if grow > 0:
                p[side] = jnp.concatenate(
                    [p[side], jnp.zeros((grow, self.num_factors))])
        self.num_users_trained = max(self.num_users_trained, f.num_users)
        self.num_items_trained = max(self.num_items_trained, f.num_items)
