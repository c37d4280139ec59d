"""Jitted minibatch-SGD epoch kernels for the matrix-factorization family.

TPU-native replacement for the reference's sequential per-rating SGD
inner loops (``MatrixFactorization.cs:166-196``,
``BiasedMatrixFactorization.cs:264-309``) and its DSGD multicore
scheduler (``MultiCore.cs:43-73``): an epoch is a ``lax.scan`` over
shuffled minibatches; each minibatch gathers factor rows, computes the
loss gradient, and scatter-adds updates back into the tables. Duplicate
user/item ids within a minibatch sum their gradients (minibatch SGD) —
mathematically the same family of update as the reference's
block-parallel DSGD, validated by held-out quality rather than
bit-identical trajectories (SURVEY §7 'hard parts').

All shapes are static: the rating arrays are padded to a multiple of the
batch size with weight-0 entries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Loss ids (reference OptimizationTarget enum, BiasedMatrixFactorization)
LOSS_RMSE = 0
LOSS_MAE = 1
LOSS_LOGISTIC = 2


def pad_to_batches(n: int, batch_size: int) -> int:
    return ((max(n, 1) + batch_size - 1) // batch_size) * batch_size


def prepare_epoch_data(users, items, values, batch_size: int):
    """Pad COO rating arrays to a multiple of batch_size; returns device-ready
    dict with an example-weight array (0 on padding)."""
    n = len(users)
    n_pad = pad_to_batches(n, batch_size)
    pad = n_pad - n
    return dict(
        users=jnp.asarray(np.concatenate([users, np.zeros(pad, np.int32)])),
        items=jnp.asarray(np.concatenate([items, np.zeros(pad, np.int32)])),
        values=jnp.asarray(np.concatenate([values, np.zeros(pad, np.float32)])),
        weights=jnp.asarray(np.concatenate(
            [np.ones(n, np.float32), np.zeros(pad, np.float32)])),
    )


def _gradient_common(loss: int, err, sig, rating_range):
    """The per-example common gradient factor (reference SetupLoss,
    BiasedMatrixFactorization.cs:246-261)."""
    if loss == LOSS_RMSE:
        return err * sig * (1.0 - sig) * rating_range
    if loss == LOSS_MAE:
        return jnp.sign(err) * sig * (1.0 - sig) * rating_range
    if loss == LOSS_LOGISTIC:
        return err
    raise ValueError(f"unknown loss {loss}")


@functools.partial(
    jax.jit,
    static_argnames=("batch_size", "loss", "biased", "update_user",
                     "update_item", "frequency_regularization"),
    donate_argnames=("params",))
def sgd_epoch(params, data, key, hp, *, batch_size: int, loss: int,
              biased: bool, update_user: bool, update_item: bool,
              frequency_regularization: bool):
    """One pass over the (shuffled) ratings.

    params: dict with 'user_factors' [U,f], 'item_factors' [I,f],
            'global_bias' scalar; if biased, also 'user_bias' [U],
            'item_bias' [I].
    data:   from prepare_epoch_data, plus (if frequency_regularization)
            'inv_sqrt_count_user' [U], 'inv_sqrt_count_item' [I].
    hp:     dict of f32 scalars: learn_rate, reg_u, reg_i, bias_reg,
            bias_learn_rate, min_rating, rating_range.
    """
    n_pad = data["users"].shape[0]
    num_batches = n_pad // batch_size
    perm = jax.random.permutation(key, n_pad)

    lr = hp["learn_rate"]

    def batch_step(p, b):
        idx = jax.lax.dynamic_slice(perm, (b * batch_size,), (batch_size,))
        u = data["users"][idx]
        i = data["items"][idx]
        v = data["values"][idx]
        w = data["weights"][idx]

        wu = p["user_factors"][u]  # [B, f]
        hi = p["item_factors"][i]  # [B, f]
        dot = jnp.sum(wu * hi, axis=-1)

        if biased:
            bu = p["user_bias"][u]
            bi = p["item_bias"][i]
            score = p["global_bias"] + bu + bi + dot
            sig = jax.nn.sigmoid(score)
            pred = hp["min_rating"] + sig * hp["rating_range"]
            err = v - pred
            g = _gradient_common(loss, err, sig, hp["rating_range"]) * w
        else:
            pred = p["global_bias"] + dot
            err = v - pred
            g = err * w

        if frequency_regularization:
            reg_u = hp["reg_u"] * data["inv_sqrt_count_user"][u]
            reg_i = hp["reg_i"] * data["inv_sqrt_count_item"][i]
        else:
            reg_u = jnp.full_like(g, hp["reg_u"])
            reg_i = jnp.full_like(g, hp["reg_i"])

        if update_user:
            delta_w = lr * (g[:, None] * hi - (w * reg_u)[:, None] * wu)
            p["user_factors"] = p["user_factors"].at[u].add(delta_w)
            if biased:
                delta_bu = hp["bias_learn_rate"] * lr * (
                    g - hp["bias_reg"] * reg_u * w * bu)
                p["user_bias"] = p["user_bias"].at[u].add(delta_bu)
        if update_item:
            delta_h = lr * (g[:, None] * wu - (w * reg_i)[:, None] * hi)
            p["item_factors"] = p["item_factors"].at[i].add(delta_h)
            if biased:
                delta_bi = hp["bias_learn_rate"] * lr * (
                    g - hp["bias_reg"] * reg_i * w * bi)
                p["item_bias"] = p["item_bias"].at[i].add(delta_bi)
        return p, None

    params, _ = jax.lax.scan(batch_step, params,
                             jnp.arange(num_batches, dtype=jnp.int32))
    return params


@functools.partial(jax.jit, static_argnames=("loss", "biased",
                                             "frequency_regularization"))
def mf_objective(params, data, hp, counts, *, loss: int, biased: bool,
                 frequency_regularization: bool):
    """Training objective = loss sum + weighted L2 complexity
    (reference BiasedMatrixFactorization.ComputeObjective :515-552,
    MatrixFactorization's squared-error ComputeObjective). Used by the
    bold-driver learn-rate heuristic."""
    u, i, v, w = data["users"], data["items"], data["values"], data["weights"]
    wu = params["user_factors"][u]
    hi = params["item_factors"][i]
    dot = jnp.sum(wu * hi, axis=-1)
    if biased:
        score = params["global_bias"] + params["user_bias"][u] + \
            params["item_bias"][i] + dot
        sig = jax.nn.sigmoid(score)
        pred = hp["min_rating"] + sig * hp["rating_range"]
    else:
        pred = params["global_bias"] + dot

    if loss == LOSS_RMSE:
        loss_sum = jnp.sum(w * (v - pred) ** 2)
    elif loss == LOSS_MAE:
        loss_sum = jnp.sum(w * jnp.abs(v - pred))
    else:  # logistic, on [0,1]-normalized values
        a = (v - hp["min_rating"]) / hp["rating_range"]
        p01 = jnp.clip((pred - hp["min_rating"]) / hp["rating_range"],
                       1e-15, 1 - 1e-15)
        loss_sum = -jnp.sum(w * (a * jnp.log(p01) + (1 - a) * jnp.log1p(-p01)))

    cu = counts["count_user"].astype(jnp.float32)
    ci = counts["count_item"].astype(jnp.float32)
    if frequency_regularization:
        wu_reg = jnp.where(cu > 0, hp["reg_u"] / jnp.sqrt(jnp.maximum(cu, 1.0)), 0.0)
        wi_reg = jnp.where(ci > 0, hp["reg_i"] / jnp.sqrt(jnp.maximum(ci, 1.0)), 0.0)
    else:
        wu_reg = cu * hp["reg_u"]
        wi_reg = ci * hp["reg_i"]
    complexity = jnp.sum(wu_reg * jnp.sum(params["user_factors"] ** 2, axis=-1))
    complexity += jnp.sum(wi_reg * jnp.sum(params["item_factors"] ** 2, axis=-1))
    if biased:
        complexity += jnp.sum(wu_reg * hp["bias_reg"] * params["user_bias"] ** 2)
        complexity += jnp.sum(wi_reg * hp["bias_reg"] * params["item_bias"] ** 2)
    return loss_sum + complexity
