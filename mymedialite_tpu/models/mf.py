"""Matrix factorization rating predictors (plain + biased).

TPU-native counterparts of reference
``RatingPrediction/MatrixFactorization.cs:50`` (plain MF, SGD on RMSE)
and ``RatingPrediction/BiasedMatrixFactorization.cs:77`` (the flagship:
biases + sigmoid-squashed prediction, selectable RMSE/MAE/LogisticLoss,
frequency regularization, bold-driver learn-rate adaptation).

The reference's sequential per-rating SGD and its DSGD multicore path
both become jitted minibatch-SGD epochs (ops/sgd.py); the reference's
``max_threads``/``naive_parallelization`` knobs are accepted for CLI
compatibility but parallelism comes from XLA + (multi-chip) sharding.
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
        self.batch_size = 8192  # TPU-specific: SGD minibatch size
        self.random_seed = 42

        self.params = None          # device pytree
        self.current_learnrate = None
        self._epoch_data = None
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
        return dict(
            learn_rate=jnp.float32(self.current_learnrate),
            reg_u=jnp.float32(self.reg_u),
            reg_i=jnp.float32(self.reg_i),
            bias_reg=jnp.float32(getattr(self, "bias_reg", 0.0)),
            bias_learn_rate=jnp.float32(getattr(self, "bias_learn_rate", 1.0)),
            min_rating=jnp.float32(self.min_rating),
            rating_range=jnp.float32(rng),
        )

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
        wu = self.init_mean + self.init_stdev * jax.random.normal(
            ku, (U, f), dtype=jnp.float32)
        hi = self.init_mean + self.init_stdev * jax.random.normal(
            ki, (I, f), dtype=jnp.float32)
        seen_u = jnp.asarray(data.count_by_user > 0)
        seen_i = jnp.asarray(data.count_by_item > 0)
        wu = jnp.where(seen_u[:, None], wu, 0.0)
        hi = jnp.where(seen_i[:, None], hi, 0.0)
        self.params = dict(
            global_bias=jnp.float32(self._init_global_bias()),
            user_factors=wu, item_factors=hi)
        if self.BIASED:
            self.params["user_bias"] = jnp.zeros(U, dtype=jnp.float32)
            self.params["item_bias"] = jnp.zeros(I, dtype=jnp.float32)
        self.current_learnrate = self.learn_rate
        self._prepare_epoch_data()

    def _prepare_epoch_data(self):
        data = self.ratings
        self._epoch_data = sgd.prepare_epoch_data(
            data.users, data.items, data.values, self.batch_size,
            shuffle_seed=self.random_seed, num_users=data.num_users,
            num_items=data.num_items)
        if self.frequency_regularization:
            cu = np.maximum(data.count_by_user, 1).astype(np.float32)
            ci = np.maximum(data.count_by_item, 1).astype(np.float32)
            self._epoch_data["inv_sqrt_count_user"] = jnp.asarray(1.0 / np.sqrt(cu))
            self._epoch_data["inv_sqrt_count_item"] = jnp.asarray(1.0 / np.sqrt(ci))
        self._counts = dict(count_user=jnp.asarray(self.ratings.count_by_user),
                            count_item=jnp.asarray(self.ratings.count_by_item))

    def train(self):
        self.init_model()
        for _ in range(self.num_iter):
            self.iterate()

    def iterate(self):
        self._key, sub = jax.random.split(self._key)
        self.params = sgd.sgd_epoch(
            self.params, self._epoch_data, sub, self._hp(),
            batch_size=self.batch_size, loss=self.loss_id, biased=self.BIASED,
            update_user=True, update_item=True,
            frequency_regularization=self.frequency_regularization)
        self.update_learn_rate()

    def update_learn_rate(self):
        self.current_learnrate *= self.learn_rate_decay

    def compute_objective(self) -> float:
        return float(sgd.mf_objective(
            self.params, self._epoch_data, self._hp(), self._counts,
            loss=self.loss_id, biased=self.BIASED,
            frequency_regularization=self.frequency_regularization))

    # --- prediction ---

    def _scores(self, users, items):
        """Raw (unbounded) scores for id arrays; out-of-range ids contribute
        only the global bias (reference Predict bounds checks)."""
        p = self.params
        U = p["user_factors"].shape[0]
        I = p["item_factors"].shape[0]
        u = jnp.asarray(users, dtype=jnp.int32)
        i = jnp.asarray(items, dtype=jnp.int32)
        uc = jnp.clip(u, 0, U - 1)
        ic = jnp.clip(i, 0, I - 1)
        u_ok = (u >= 0) & (u < U)
        i_ok = (i >= 0) & (i < I)
        dot = jnp.sum(p["user_factors"][uc] * p["item_factors"][ic], axis=-1)
        score = p["global_bias"] + jnp.where(u_ok & i_ok, dot, 0.0)
        if self.BIASED:
            score = score + jnp.where(u_ok, p["user_bias"][uc], 0.0)
            score = score + jnp.where(i_ok, p["item_bias"][ic], 0.0)
        return score

    def _bound(self, score):
        return jnp.clip(score, self.min_rating, self.max_rating)

    def predict_batch(self, users, items):
        return np.asarray(self._bound(self._scores(users, items)))

    def score_catalog(self, users):
        p = self.params
        u = jnp.clip(jnp.asarray(users, dtype=jnp.int32), 0,
                     p["user_factors"].shape[0] - 1)
        score = p["global_bias"] + p["user_factors"][u] @ p["item_factors"].T
        if self.BIASED:
            score = score + p["user_bias"][u][:, None] + p["item_bias"][None, :]
        return np.asarray(self._bound(score))

    # --- incremental updates (reference MatrixFactorization.cs:262-320) ---

    def add_user(self, user_id):
        super().add_user(user_id)
        grow = user_id + 1 - self.params["user_factors"].shape[0]
        if grow > 0:
            f = self.params["user_factors"].shape[1]
            self.params["user_factors"] = jnp.concatenate(
                [self.params["user_factors"], jnp.zeros((grow, f))], axis=0)
            if self.BIASED:
                self.params["user_bias"] = jnp.concatenate(
                    [self.params["user_bias"], jnp.zeros(grow)])

    def add_item(self, item_id):
        super().add_item(item_id)
        grow = item_id + 1 - self.params["item_factors"].shape[0]
        if grow > 0:
            f = self.params["item_factors"].shape[1]
            self.params["item_factors"] = jnp.concatenate(
                [self.params["item_factors"], jnp.zeros((grow, f))], axis=0)
            if self.BIASED:
                self.params["item_bias"] = jnp.concatenate(
                    [self.params["item_bias"], jnp.zeros(grow)])

    def _retrain(self, users, items):
        if self.params is None:
            return
        for u in np.unique(np.asarray(users, dtype=np.int64)):
            self.add_user(int(u))
            if self.update_users:
                self.retrain_user(int(u))
        for i in np.unique(np.asarray(items, dtype=np.int64)):
            self.add_item(int(i))
            if self.update_items:
                self.retrain_item(int(i))

    def _learn_rows(self, idx, update_user, update_item):
        """num_iter SGD passes over a subset of ratings (reference
        LearnFactors on ByUser/ByItem index lists)."""
        data = self.ratings
        epoch = sgd.prepare_epoch_data(
            data.users[idx], data.items[idx], data.values[idx],
            min(self.batch_size, max(len(idx), 1)),
            shuffle_seed=self.random_seed,
            num_users=data.num_users, num_items=data.num_items)
        if self.frequency_regularization:
            epoch["inv_sqrt_count_user"] = self._epoch_data["inv_sqrt_count_user"]
            epoch["inv_sqrt_count_item"] = self._epoch_data["inv_sqrt_count_item"]
        lr = self.learn_rate
        hp = self._hp()
        for _ in range(self.num_iter):
            hp = dict(hp, learn_rate=jnp.float32(lr))
            self._key, sub = jax.random.split(self._key)
            self.params = sgd.sgd_epoch(
                self.params, epoch, sub, hp,
                batch_size=int(epoch["users"].shape[0]), loss=self.loss_id,
                biased=self.BIASED, update_user=update_user,
                update_item=update_item,
                frequency_regularization=self.frequency_regularization)
            lr *= self.learn_rate_decay

    def retrain_user(self, user_id):
        """Fresh row init + num_iter SGD over the user's ratings
        (reference RetrainUser, MatrixFactorization.cs:142-150)."""
        self._prepare_epoch_data()
        self._key, sub = jax.random.split(self._key)
        row = self.init_mean + self.init_stdev * jax.random.normal(
            sub, (self.num_factors,), dtype=jnp.float32)
        self.params["user_factors"] = self.params["user_factors"].at[user_id].set(row)
        if self.BIASED:
            self.params["user_bias"] = self.params["user_bias"].at[user_id].set(0.0)
        idx = self.ratings.by_user.segment(user_id)
        if idx.size:
            self._learn_rows(idx, True, False)

    def retrain_item(self, item_id):
        self._prepare_epoch_data()
        self._key, sub = jax.random.split(self._key)
        row = self.init_mean + self.init_stdev * jax.random.normal(
            sub, (self.num_factors,), dtype=jnp.float32)
        self.params["item_factors"] = self.params["item_factors"].at[item_id].set(row)
        if self.BIASED:
            self.params["item_bias"] = self.params["item_bias"].at[item_id].set(0.0)
        idx = self.ratings.by_item.segment(item_id)
        if idx.size:
            self._learn_rows(idx, False, True)

    def remove_user(self, user_id):
        super().remove_user(user_id)
        self.params["user_factors"] = \
            self.params["user_factors"].at[user_id].set(0.0)
        if self.BIASED:
            self.params["user_bias"] = self.params["user_bias"].at[user_id].set(0.0)

    def remove_item(self, item_id):
        super().remove_item(item_id)
        self.params["item_factors"] = \
            self.params["item_factors"].at[item_id].set(0.0)
        if self.BIASED:
            self.params["item_bias"] = self.params["item_bias"].at[item_id].set(0.0)

    # --- fold-in (reference MatrixFactorization.cs:326-352) ---

    def _fold_in_vector(self, rated_items):
        """Learn a factor vector for an unseen user by SGD against the
        (frozen) item factors."""
        items = jnp.asarray([i for i, _ in rated_items], dtype=jnp.int32)
        values = jnp.asarray([v for _, v in rated_items], dtype=jnp.float32)
        H = self.params["item_factors"][items]  # [m, f]
        bias = self._foldin_item_bias(items)
        self._key, sub = jax.random.split(self._key)
        vec = self.init_mean + self.init_stdev * jax.random.normal(
            sub, (self.num_factors,), dtype=jnp.float32)
        lr = self.learn_rate
        for _ in range(self.num_iter):
            pred = self._foldin_predict(vec, H, bias)
            err = values - pred
            grad = err[:, None] * H - self.regularization * vec[None, :]
            vec = vec + lr * jnp.sum(grad, axis=0)
            lr *= self.learn_rate_decay
        return vec

    def _foldin_item_bias(self, items):
        return jnp.zeros(items.shape[0], dtype=jnp.float32)

    def _foldin_predict(self, vec, H, bias):
        return self.params["global_bias"] + H @ vec

    def score_items_foldin(self, rated_items, candidates):
        vec = self._fold_in_vector(rated_items)
        cand = jnp.asarray(list(candidates), dtype=jnp.int32)
        H = self.params["item_factors"][cand]
        scores = self._bound(self._foldin_predict(
            vec, H, self._foldin_item_bias(cand)))
        return [(int(i), float(s)) for i, s in zip(cand, np.asarray(scores))]

    # --- persistence (reference MatrixFactorization SaveModel/LoadModel) ---

    def save_model(self, path):
        with ModelWriter(path, type(self).__name__, "2.99") as w:
            w.scalar(float(self.params["global_bias"]))
            w.matrix(np.asarray(self.params["user_factors"]))
            w.matrix(np.asarray(self.params["item_factors"]))

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
        self.params = dict(global_bias=jnp.float32(gb),
                           user_factors=jnp.asarray(wu),
                           item_factors=jnp.asarray(hi))
        self.current_learnrate = self.learn_rate
        self._key = jax.random.PRNGKey(self.random_seed)


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
        self.max_threads = 1              # accepted for CLI compat; XLA parallelizes
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

    def _bound(self, score):
        rng = max(self.max_rating - self.min_rating, 1e-9)
        return self.min_rating + jax.nn.sigmoid(score) * rng

    def _foldin_item_bias(self, items):
        return self.params["item_bias"][items]

    def _foldin_predict(self, vec, H, bias):
        # fold-in trains against the *bounded* sigmoid prediction
        rng = max(self.max_rating - self.min_rating, 1e-9)
        score = self.params["global_bias"] + bias + H @ vec
        return self.min_rating + jax.nn.sigmoid(score) * rng

    def _fold_in_vector(self, rated_items):
        """BiasedMF fold-in learns bias + factors with the sigmoid loss
        (reference BiasedMatrixFactorization fold-in path)."""
        items = jnp.asarray([i for i, _ in rated_items], dtype=jnp.int32)
        values = jnp.asarray([v for _, v in rated_items], dtype=jnp.float32)
        H = self.params["item_factors"][items]
        bias = self.params["item_bias"][items]
        rng = max(self.max_rating - self.min_rating, 1e-9)
        self._key, sub = jax.random.split(self._key)
        vec = self.init_mean + self.init_stdev * jax.random.normal(
            sub, (self.num_factors,), dtype=jnp.float32)
        b_u = jnp.float32(0.0)
        lr = self.learn_rate
        for _ in range(self.num_iter):
            score = self.params["global_bias"] + b_u + bias + H @ vec
            sig = jax.nn.sigmoid(score)
            err = values - (self.min_rating + sig * rng)
            g = sgd._gradient_common(self.loss_id, err, sig, rng)
            b_u = b_u + self.bias_learn_rate * lr * jnp.sum(
                g - self.bias_reg * self.reg_u * b_u)
            grad = g[:, None] * H - self.reg_u * vec[None, :]
            vec = vec + lr * jnp.sum(grad, axis=0)
            lr *= self.learn_rate_decay
        self._foldin_bias = b_u
        return vec

    def _foldin_user_bias(self):
        return getattr(self, "_foldin_bias", jnp.float32(0.0))

    def score_items_foldin(self, rated_items, candidates):
        vec = self._fold_in_vector(rated_items)
        cand = jnp.asarray(list(candidates), dtype=jnp.int32)
        H = self.params["item_factors"][cand]
        rng = max(self.max_rating - self.min_rating, 1e-9)
        score = self.params["global_bias"] + self._foldin_user_bias() + \
            self.params["item_bias"][cand] + H @ vec
        scores = self.min_rating + jax.nn.sigmoid(score) * rng
        return [(int(i), float(s)) for i, s in zip(cand, np.asarray(scores))]

    # persistence (reference BiasedMatrixFactorization.cs:339-402)

    def save_model(self, path):
        with ModelWriter(path, type(self).__name__, "2.99") as w:
            w.scalar(float(self.params["global_bias"]))
            w.scalar(self.min_rating)
            w.scalar(self.max_rating)
            w.vector(np.asarray(self.params["user_bias"]))
            w.matrix(np.asarray(self.params["user_factors"]))
            w.vector(np.asarray(self.params["item_bias"]))
            w.matrix(np.asarray(self.params["item_factors"]))

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
        self.params = dict(global_bias=jnp.float32(gb),
                           user_factors=jnp.asarray(wu),
                           item_factors=jnp.asarray(hi),
                           user_bias=jnp.asarray(bu),
                           item_bias=jnp.asarray(bi))
        self.current_learnrate = self.learn_rate
        self._key = jax.random.PRNGKey(self.random_seed)
