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
        self._build_histories()

    def _build_histories(self):
        f = self.feedback
        uh, ul = padded_history(f.by_user)
        ih, il = padded_history(f.by_item)
        uh, ul, _ = pad_rows(uh, ul, self.solve_chunk)
        ih, il, _ = pad_rows(ih, il, self.solve_chunk)
        self._user_hist = (jnp.asarray(uh), jnp.asarray(ul))
        self._item_hist = (jnp.asarray(ih), jnp.asarray(il))

    def iterate(self):
        """One alternation (reference WRMF.Iterate :68-73)."""
        p = self.params
        alpha = jnp.float32(self.alpha)
        reg = jnp.float32(self.regularization)
        uh, ul = self._user_hist
        W = wrmf_optimize(p["item_factors"], uh, ul, alpha, reg,
                          chunk=self.solve_chunk)
        p["user_factors"] = W[:p["user_factors"].shape[0]]
        ih, il = self._item_hist
        H = wrmf_optimize(p["user_factors"], ih, il, alpha, reg,
                          chunk=self.solve_chunk)
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
