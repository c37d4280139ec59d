"""Matrix factorization rating predictors (plain + biased).

TPU-native counterparts of reference
``RatingPrediction/MatrixFactorization.cs:50`` (plain MF, SGD on RMSE)
and ``RatingPrediction/BiasedMatrixFactorization.cs:77`` (the flagship:
biases + sigmoid-squashed prediction, selectable RMSE/MAE/LogisticLoss,
frequency regularization, bold-driver learn-rate adaptation).

The reference's sequential per-rating SGD and its DSGD multicore path
both become jitted blocked minibatch-SGD epochs (ops/sgd.py,
``sgd_epoch_blocked``): biases live as fused extra columns of the factor
tables ([factors | b_u | 1] x [factors | 1 | b_i]), the user table is
processed through VMEM-resident slabs of contiguous user-id groups, and
the item table stays resident. The reference's ``max_threads`` /
``naive_parallelization`` knobs are accepted for CLI compatibility;
parallelism comes from XLA + (multi-chip) sharding.
"""

from __future__ import annotations

import enum
import math

import jax
import jax.numpy as jnp
import numpy as np

from mymedialite_tpu.io.model_io import ModelReader, ModelWriter
from mymedialite_tpu.models.base import (
    FoldInRatingPredictor, IncrementalRatingPredictor, IterativeModel,
)
from mymedialite_tpu.ops import sgd


class OptimizationTarget(enum.Enum):
    """Reference OptimizationTarget enum (RMSE / MAE / LogisticLoss)."""
    RMSE = "RMSE"
    MAE = "MAE"
    LOGISTIC_LOSS = "LogisticLoss"


_LOSS_ID = {
    OptimizationTarget.RMSE: sgd.LOSS_RMSE,
    OptimizationTarget.MAE: sgd.LOSS_MAE,
    OptimizationTarget.LOGISTIC_LOSS: sgd.LOSS_LOGISTIC,
}


# module-level pure catalog scorers (stable identity -> one jit compile;
# see Recommender.catalog_scorer)

def _mf_catalog_raw(params, users):
    W, H = params["W"], params["H"]
    u = jnp.clip(users, 0, W.shape[0] - 1)
    return params["global_bias"] + W[u] @ H.T


def _mf_catalog_clip(params, users):
    return jnp.clip(_mf_catalog_raw(params, users),
                    params["min_rating"], params["max_rating"])


def _mf_catalog_sigmoid(params, users):
    rng = jnp.maximum(params["max_rating"] - params["min_rating"], 1e-9)
    return params["min_rating"] + \
        jax.nn.sigmoid(_mf_catalog_raw(params, users)) * rng


class MatrixFactorization(IncrementalRatingPredictor, IterativeModel,
                          FoldInRatingPredictor):
    """Plain MF: prediction = global_bias + <w_u, h_i>, clamped to the
    rating scale (reference MatrixFactorization.cs:50-217)."""

    HYPERPARAMS = {
        "num_factors": int,
        "regularization": float,
        "learn_rate": float,
        "learn_rate_decay": float,
        "num_iter": int,
    }
    EXTRA_PARAMS = {
        "init_mean": float,
        "init_stdev": float,
        "batch_size": int,
        "group_users": int,
    }

    BIASED = False

    def __init__(self):
        super().__init__()
        # defaults per reference MatrixFactorization.cs:87-95
        self.num_factors = 10
        self.regularization = 0.015
        self.learn_rate = 0.01
        self.learn_rate_decay = 1.0
        self.num_iter = 30
        self.init_mean = 0.0
        self.init_stdev = 0.1
        self.batch_size = 131_072   # TPU-specific: SGD minibatch size
        self.group_users = 16_384   # TPU-specific: user-slab rows
        self.random_seed = 42

        self.W_ext = None           # [U_pad, f+2] fused user table
        self.H_ext = None           # [I, f+2] fused item table
        self.global_bias = 0.0
        self.current_learnrate = None
        self._blocked = None
        self._flat_cache = None
        self._key = None

    # --- hyperparameter plumbing ---

    @property
    def reg_u(self):
        return getattr(self, "_reg_u", self.regularization)

    @reg_u.setter
    def reg_u(self, v):
        self._reg_u = float(v)

    @property
    def reg_i(self):
        return getattr(self, "_reg_i", self.regularization)

    @reg_i.setter
    def reg_i(self, v):
        self._reg_i = float(v)

    @property
    def loss_id(self):
        return sgd.LOSS_RMSE

    @property
    def frequency_regularization(self):
        return False

    def _hp(self):
        rng = max(self.max_rating - self.min_rating, 1e-9)
        return dict(global_bias=jnp.float32(self.global_bias),
                    min_rating=jnp.float32(self.min_rating),
                    rating_range=jnp.float32(rng))

    # --- model init / training ---

    def _init_global_bias(self):
        return float(self.ratings.average)

    def init_model(self):
        """Factor allocation + N(mean, stdev) init; zero rows for entities
        without training examples (reference MatrixFactorization.cs:99-116)."""
        data = self.ratings
        key = jax.random.PRNGKey(self.random_seed)
        self._key, ku, ki = jax.random.split(key, 3)
        U, I, f = data.num_users, data.num_items, self.num_factors
        wu = self.init_mean + self.init_stdev * np.array(
            jax.random.normal(ku, (U, f), dtype=jnp.float32))
        hi = self.init_mean + self.init_stdev * np.array(
            jax.random.normal(ki, (I, f), dtype=jnp.float32))
        wu[data.count_by_user == 0] = 0.0
        hi[data.count_by_item == 0] = 0.0
        self.W_ext, self.H_ext = sgd.extend_tables(
            wu, hi, group_users=self.group_users)
        self.global_bias = self._init_global_bias()
        self.current_learnrate = self.learn_rate
        self._prepare_epoch_data()

    def _prepare_epoch_data(self):
        data = self.ratings
        self._blocked, self._bmeta = sgd.prepare_blocked_data(
            data.users, data.items, data.values, data.num_users,
            self.batch_size, self.group_users, shuffle_seed=self.random_seed)
        if self.frequency_regularization:
            U_pad = self.W_ext.shape[0] if self.W_ext is not None else \
                self._bmeta["ngroups"] * self._bmeta["group_users"]
            cu = np.zeros(U_pad, np.float32)
            cu[:data.num_users] = data.count_by_user
            ci = np.maximum(data.count_by_item, 1).astype(np.float32)
            self._freq = (jnp.asarray(1.0 / np.sqrt(np.maximum(cu, 1.0))),
                          jnp.asarray(1.0 / np.sqrt(ci)))
        else:
            self._freq = (jnp.zeros(0), jnp.zeros(0))
        self._flat_cache = None

    def _flat_data(self):
        """Flat epoch-data view, used by the objective computation."""
        if self._flat_cache is None:
            data = self.ratings
            self._flat_cache = sgd.prepare_epoch_data(
                data.users, data.items, data.values, self.batch_size,
                shuffle_seed=None, num_users=data.num_users,
                num_items=data.num_items)
            self._counts = dict(
                count_user=jnp.asarray(data.count_by_user),
                count_item=jnp.asarray(data.count_by_item))
        return self._flat_cache

    def train(self):
        self.init_model()
        for _ in range(self.num_iter):
            self.iterate()

    def _ensure_epoch_ready(self):
        """Lazily rebuild the blocked epoch data when missing — e.g. after
        ``load_model`` — so ``iterate()``/``compute_objective()`` keep
        working without a fresh ``train()`` (reference
        MatrixFactorization.cs Train/Iterate split: LoadModel then Iterate
        continues training)."""
        if self._blocked is None:
            if self.ratings is None:
                raise RuntimeError(
                    f"{type(self).__name__}: no ratings set; assign "
                    ".ratings before iterating a loaded model")
            self._prepare_epoch_data()
        # grow the loaded tables to cover the epoch's padded id space
        need_u = self._bmeta["ngroups"] * self._bmeta["group_users"]
        if self.W_ext.shape[0] < need_u:
            fe = self.W_ext.shape[1]
            pad = np.zeros((need_u - self.W_ext.shape[0], fe), np.float32)
            pad[:, fe - 1] = 1.0
            self.W_ext = jnp.concatenate([self.W_ext, jnp.asarray(pad)])
        if self.H_ext.shape[0] < self.ratings.num_items:
            fe = self.H_ext.shape[1]
            pad = np.zeros((self.ratings.num_items - self.H_ext.shape[0], fe),
                           np.float32)
            pad[:, fe - 2] = 1.0
            self.H_ext = jnp.concatenate([self.H_ext, jnp.asarray(pad)])

    def iterate(self, update_user: bool = True, update_item: bool = True):
        self._ensure_epoch_ready()
        self._key, sub = jax.random.split(self._key)
        rates = sgd.column_rates(
            self.num_factors, self.current_learnrate, self.reg_u, self.reg_i,
            getattr(self, "bias_learn_rate", 1.0),
            getattr(self, "bias_reg", 0.0), self.BIASED,
            update_user, update_item)
        self.W_ext, self.H_ext = sgd.sgd_epoch_blocked(
            self.W_ext, self.H_ext, self._blocked, sub, self._hp(), rates,
            self._freq, meta=tuple(sorted(self._bmeta.items())),
            loss=self.loss_id, biased=self.BIASED,
            frequency_regularization=self.frequency_regularization)
        self.update_learn_rate()

    def update_learn_rate(self):
        self.current_learnrate *= self.learn_rate_decay

    def _params_dict(self):
        f = self.num_factors
        U = self.num_users_trained
        return dict(
            global_bias=jnp.float32(self.global_bias),
            user_factors=self.W_ext[:U, :f],
            item_factors=self.H_ext[:, :f],
            user_bias=self.W_ext[:U, f],
            item_bias=self.H_ext[:, f + 1])

    def compute_objective(self) -> float:
        self._ensure_epoch_ready()
        data = self._flat_data()
        hp = dict(self._hp(),
                  learn_rate=jnp.float32(self.current_learnrate),
                  reg_u=jnp.float32(self.reg_u),
                  reg_i=jnp.float32(self.reg_i),
                  bias_reg=jnp.float32(getattr(self, "bias_reg", 0.0)))
        return float(sgd.mf_objective(
            self._params_dict(), data, hp, self._counts,
            loss=self.loss_id, biased=self.BIASED,
            frequency_regularization=self.frequency_regularization))

    # --- prediction ---

    def _scores(self, users, items):
        """Raw (unbounded) scores for id arrays; out-of-range ids contribute
        only the global bias (reference Predict bounds checks)."""
        U = self.num_users_trained
        I = self.H_ext.shape[0]
        u = jnp.asarray(users, dtype=jnp.int32)
        i = jnp.asarray(items, dtype=jnp.int32)
        uc = jnp.clip(u, 0, self.W_ext.shape[0] - 1)
        ic = jnp.clip(i, 0, I - 1)
        u_ok = (u >= 0) & (u < U)
        i_ok = (i >= 0) & (i < I)
        f = self.num_factors
        wu = self.W_ext[uc]
        hi = self.H_ext[ic]
        dot = jnp.sum(wu[:, :f] * hi[:, :f], axis=-1)
        score = self.global_bias + jnp.where(u_ok & i_ok, dot, 0.0)
        if self.BIASED:
            score = score + jnp.where(u_ok, wu[:, f], 0.0)
            score = score + jnp.where(i_ok, hi[:, f + 1], 0.0)
        return score

    def _bound(self, score):
        return jnp.clip(score, self.min_rating, self.max_rating)

    def predict_batch(self, users, items):
        return np.asarray(self._bound(self._scores(users, items)))

    BOUND = "clip"  # BiasedMF overrides with "sigmoid"

    def catalog_scorer(self):
        if self.W_ext is None:
            raise RuntimeError(f"{type(self).__name__}: model not trained")
        if self.BIASED:
            # fused dot includes both biases
            W, H = self.W_ext, self.H_ext
        else:
            f = self.num_factors
            W, H = self.W_ext[:, :f], self.H_ext[:, :f]
        params = dict(W=W, H=H,
                      global_bias=jnp.float32(self.global_bias),
                      min_rating=jnp.float32(self.min_rating),
                      max_rating=jnp.float32(self.max_rating))
        fn = _mf_catalog_sigmoid if self.BOUND == "sigmoid" \
            else _mf_catalog_clip
        return fn, params

    def score_catalog(self, users):
        return np.asarray(self.score_catalog_device(users))

    # --- incremental updates (reference MatrixFactorization.cs:262-320) ---

    def add_user(self, user_id):
        super().add_user(user_id)
        grow = user_id + 1 - self.W_ext.shape[0]
        if grow > 0:
            G = self._bmeta["group_users"]
            grow = ((grow + G - 1) // G) * G
            fe = self.W_ext.shape[1]
            pad = np.zeros((grow, fe), np.float32)
            pad[:, fe - 1] = 1.0
            self.W_ext = jnp.concatenate([self.W_ext, jnp.asarray(pad)])

    def add_item(self, item_id):
        super().add_item(item_id)
        grow = item_id + 1 - self.H_ext.shape[0]
        if grow > 0:
            fe = self.H_ext.shape[1]
            pad = np.zeros((grow, fe), np.float32)
            pad[:, fe - 2] = 1.0
            self.H_ext = jnp.concatenate([self.H_ext, jnp.asarray(pad)])

    def _retrain(self, users, items):
        if self.W_ext is None:
            return
        self._prepare_epoch_data()
        for u in np.unique(np.asarray(users, dtype=np.int64)):
            self.add_user(int(u))
            if self.update_users:
                self.retrain_user(int(u))
        for i in np.unique(np.asarray(items, dtype=np.int64)):
            self.add_item(int(i))
            if self.update_items:
                self.retrain_item(int(i))

    def _fresh_row(self, num_cols, bias_col):
        self._key, sub = jax.random.split(self._key)
        row = np.zeros(num_cols, np.float32)
        row[:self.num_factors] = self.init_mean + self.init_stdev * np.asarray(
            jax.random.normal(sub, (self.num_factors,), dtype=jnp.float32))
        row[bias_col] = 1.0
        return jnp.asarray(row)

    def retrain_user(self, user_id):
        """Fresh row init + num_iter SGD passes over just this user's
        ratings, item side frozen (reference RetrainUser,
        MatrixFactorization.cs:142-150)."""
        fe = self.W_ext.shape[1]
        self.W_ext = self.W_ext.at[user_id].set(self._fresh_row(fe, fe - 1))
        idx = self.ratings.by_user.segment(user_id)
        if idx.size == 0:
            return
        items = jnp.asarray(self.ratings.items[idx])
        vals = jnp.asarray(self.ratings.values[idx])
        H_rows = self.H_ext[items]
        row = self.W_ext[user_id]
        row = _learn_row(row, H_rows, vals, self.num_factors,
                         self.num_iter, self.learn_rate,
                         self.learn_rate_decay, self.reg_u,
                         getattr(self, "bias_learn_rate", 1.0),
                         getattr(self, "bias_reg", 0.0),
                         jnp.float32(self.global_bias),
                         jnp.float32(self.min_rating),
                         jnp.float32(max(self.max_rating - self.min_rating,
                                         1e-9)),
                         biased=self.BIASED, loss=self.loss_id,
                         frozen_col=fe - 1, bias_col=fe - 2)
        self.W_ext = self.W_ext.at[user_id].set(row)

    def retrain_item(self, item_id):
        fe = self.H_ext.shape[1]
        self.H_ext = self.H_ext.at[item_id].set(self._fresh_row(fe, fe - 2))
        idx = self.ratings.by_item.segment(item_id)
        if idx.size == 0:
            return
        users = jnp.asarray(self.ratings.users[idx])
        vals = jnp.asarray(self.ratings.values[idx])
        W_rows = self.W_ext[users]
        row = self.H_ext[item_id]
        row = _learn_row(row, W_rows, vals, self.num_factors,
                         self.num_iter, self.learn_rate,
                         self.learn_rate_decay, self.reg_i,
                         getattr(self, "bias_learn_rate", 1.0),
                         getattr(self, "bias_reg", 0.0),
                         jnp.float32(self.global_bias),
                         jnp.float32(self.min_rating),
                         jnp.float32(max(self.max_rating - self.min_rating,
                                         1e-9)),
                         biased=self.BIASED, loss=self.loss_id,
                         frozen_col=fe - 2, bias_col=fe - 1)
        self.H_ext = self.H_ext.at[item_id].set(row)

    def remove_user(self, user_id):
        super().remove_user(user_id)
        fe = self.W_ext.shape[1]
        row = np.zeros(fe, np.float32)
        row[fe - 1] = 1.0
        self.W_ext = self.W_ext.at[user_id].set(jnp.asarray(row))

    def remove_item(self, item_id):
        super().remove_item(item_id)
        fe = self.H_ext.shape[1]
        row = np.zeros(fe, np.float32)
        row[fe - 2] = 1.0
        self.H_ext = self.H_ext.at[item_id].set(jnp.asarray(row))

    # --- fold-in (reference MatrixFactorization.cs:326-352) ---

    def score_items_foldin(self, rated_items, candidates):
        items = jnp.asarray([i for i, _ in rated_items], dtype=jnp.int32)
        values = jnp.asarray([v for _, v in rated_items], dtype=jnp.float32)
        fe = self.W_ext.shape[1]
        row = self._fresh_row(fe, fe - 1)
        row = _learn_row(row, self.H_ext[items], values, self.num_factors,
                         self.num_iter, self.learn_rate,
                         self.learn_rate_decay, self.regularization,
                         getattr(self, "bias_learn_rate", 1.0),
                         getattr(self, "bias_reg", 0.0),
                         jnp.float32(self.global_bias),
                         jnp.float32(self.min_rating),
                         jnp.float32(max(self.max_rating - self.min_rating,
                                         1e-9)),
                         biased=self.BIASED, loss=self.loss_id,
                         frozen_col=fe - 1, bias_col=fe - 2)
        cand = jnp.asarray(list(candidates), dtype=jnp.int32)
        score = self.global_bias + self.H_ext[cand] @ row
        scores = self._bound(score)
        return [(int(i), float(s)) for i, s in zip(cand, np.asarray(scores))]

    # --- persistence (reference MatrixFactorization SaveModel/LoadModel) ---

    def save_model(self, path):
        wu, hi, _, _ = sgd.split_tables(self.W_ext, self.H_ext,
                                        self.num_users_trained)
        with ModelWriter(path, type(self).__name__, "2.99") as w:
            w.scalar(self.global_bias)
            w.matrix(wu)
            w.matrix(hi)

    def load_model(self, path):
        with ModelReader(path, type(self).__name__) as r:
            gb = r.scalar()
            wu = r.matrix()
            hi = r.matrix()
        if wu.shape[1] != hi.shape[1]:
            raise IOError("number of user and item factors must match")
        self.num_factors = wu.shape[1]
        self.num_users_trained = wu.shape[0]
        self.num_items_trained = hi.shape[0]
        self.global_bias = gb
        self.W_ext, self.H_ext = sgd.extend_tables(
            wu, hi, group_users=self.group_users)
        self.current_learnrate = self.learn_rate
        self._key = jax.random.PRNGKey(self.random_seed)
        self._bmeta = dict(ngroups=self.W_ext.shape[0] // min(
            self.group_users, max(wu.shape[0], 1)),
            group_users=min(self.group_users, max(wu.shape[0], 1)),
            batch=self.batch_size, l_pad=0)


@jax.jit
def _sigmoid_pred(score, min_rating, rating_range):
    return min_rating + jax.nn.sigmoid(score) * rating_range


def _learn_row(row, other_rows, values, num_factors, num_iter, learn_rate,
               decay, reg, bias_lr, bias_reg, global_bias, min_rating,
               rating_range, *, biased, loss, frozen_col, bias_col):
    """num_iter minibatch updates of a single fused row against frozen
    counterpart rows (reference LearnFactors on ByUser/ByItem lists +
    FoldIn, MatrixFactorization.cs:142-160, 326-352)."""
    f = num_factors
    fe = row.shape[0]
    lr_vec = np.full(fe, float(learn_rate), np.float32)
    lr_vec[frozen_col] = 0.0
    lr_vec[bias_col] = float(bias_lr) * float(learn_rate) if biased else 0.0
    reg_vec = np.full(fe, float(reg), np.float32)
    reg_vec[frozen_col] = 0.0
    reg_vec[bias_col] = float(bias_reg) * float(reg) if biased else 0.0
    lr_vec = jnp.asarray(lr_vec)
    reg_vec = jnp.asarray(reg_vec)
    lr_scale = 1.0
    for _ in range(num_iter):
        score = other_rows @ row
        if biased:
            sig = jax.nn.sigmoid(score + global_bias)
            pred = min_rating + sig * rating_range
            err = values - pred
            g = sgd._gradient_common(loss, err, sig, rating_range)
        else:
            g = values - (score + global_bias)
        grad = jnp.sum(g[:, None] * other_rows, axis=0) \
            - values.shape[0] * reg_vec * row
        row = row + lr_scale * lr_vec * grad
        lr_scale *= decay
    return row


class BiasedMatrixFactorization(MatrixFactorization):
    """The flagship rating predictor (reference
    BiasedMatrixFactorization.cs:77): prediction =
    min + sigmoid(global + b_u + b_i + <w_u,h_i>) * range."""

    HYPERPARAMS = {
        "num_factors": int,
        "bias_reg": float,
        "reg_u": float,
        "reg_i": float,
        "frequency_regularization": bool,
        "learn_rate": float,
        "bias_learn_rate": float,
        "learn_rate_decay": float,
        "num_iter": int,
        "bold_driver": bool,
        "loss": OptimizationTarget,
        "max_threads": int,
        "naive_parallelization": bool,
    }
    EXTRA_PARAMS = {
        "regularization": float,
        "init_mean": float,
        "init_stdev": float,
        "batch_size": int,
        "group_users": int,
    }

    BIASED = True

    def __init__(self):
        super().__init__()
        # defaults per reference BiasedMatrixFactorization.cs:85-92
        self.bias_reg = 0.01
        self.bias_learn_rate = 1.0
        self.frequency_regularization = False
        self.bold_driver = False
        self.loss = OptimizationTarget.RMSE
        self.max_threads = 1              # accepted for CLI compat
        self.naive_parallelization = False
        self._last_loss = -math.inf

    # BiasedMF's Regularization setter fans out to RegU/RegI
    # (reference BiasedMatrixFactorization.cs:96-103)
    @property
    def regularization(self):
        return getattr(self, "_regularization", 0.015)

    @regularization.setter
    def regularization(self, v):
        self._regularization = float(v)
        self._reg_u = float(v)
        self._reg_i = float(v)

    @property
    def frequency_regularization(self):
        return getattr(self, "_freq_reg", False)

    @frequency_regularization.setter
    def frequency_regularization(self, v):
        self._freq_reg = bool(v)

    @property
    def loss_id(self):
        return _LOSS_ID[self.loss]

    def _init_global_bias(self):
        # logit of normalized average (reference Train :188-190)
        rng = max(self.max_rating - self.min_rating, 1e-9)
        avg = (self.ratings.average - self.min_rating) / rng
        avg = min(max(avg, 1e-6), 1 - 1e-6)
        return math.log(avg / (1 - avg))

    def init_model(self):
        super().init_model()
        if self.bold_driver:
            self._last_loss = self.compute_objective()

    def update_learn_rate(self):
        """Bold driver (reference UpdateLearnRate :225-244): halve on
        objective increase, *1.05 on decrease."""
        if self.bold_driver:
            loss = self.compute_objective()
            if loss > self._last_loss:
                self.current_learnrate *= 0.5
            elif loss < self._last_loss:
                self.current_learnrate *= 1.05
            self._last_loss = loss
        else:
            self.current_learnrate *= self.learn_rate_decay

    BOUND = "sigmoid"

    def _bound(self, score):
        rng = max(self.max_rating - self.min_rating, 1e-9)
        return self.min_rating + jax.nn.sigmoid(score) * rng

    # persistence (reference BiasedMatrixFactorization.cs:339-402)

    def save_model(self, path):
        wu, hi, bu, bi = sgd.split_tables(self.W_ext, self.H_ext,
                                          self.num_users_trained)
        with ModelWriter(path, type(self).__name__, "2.99") as w:
            w.scalar(self.global_bias)
            w.scalar(self.min_rating)
            w.scalar(self.max_rating)
            w.vector(bu)
            w.matrix(wu)
            w.vector(bi)
            w.matrix(hi)

    def load_model(self, path):
        with ModelReader(path, type(self).__name__) as r:
            gb = r.scalar()
            self.min_rating = r.scalar()
            self.max_rating = r.scalar()
            bu = r.vector()
            wu = r.matrix()
            bi = r.vector()
            hi = r.matrix()
        if wu.shape[1] != hi.shape[1]:
            raise IOError("number of user and item factors must match")
        if bu.shape[0] != wu.shape[0] or bi.shape[0] != hi.shape[0]:
            raise IOError("bias/factor dimensions must match")
        self.num_factors = wu.shape[1]
        self.num_users_trained = wu.shape[0]
        self.num_items_trained = hi.shape[0]
        self.global_bias = gb
        self.W_ext, self.H_ext = sgd.extend_tables(
            wu, hi, bu, bi, group_users=self.group_users)
        self.current_learnrate = self.learn_rate
        self._key = jax.random.PRNGKey(self.random_seed)
        self._bmeta = dict(ngroups=self.W_ext.shape[0] // min(
            self.group_users, max(wu.shape[0], 1)),
            group_users=min(self.group_users, max(wu.shape[0], 1)),
            batch=self.batch_size, l_pad=0)
