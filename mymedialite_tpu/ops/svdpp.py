"""Jitted training epochs for the SVD++ / asymmetric-factor-model family.

TPU-native replacement for the reference's per-rating loop that touches
every item in the user's history (``SVDPlusPlus.cs:157-213``): users are
processed in contiguous id groups; per group the implicit user vector
    s_u = (sum_{j in I_u} y_j) / sqrt(|I_u|)   (+ p_u where applicable)
is computed once by a gather + segment_sum over the group's history
edges, the group's ratings are processed as one fused batch (biases,
p, q updates), and the accumulated per-user error term
    c_u = sum_{ratings (u,i)} err * q_i / sqrt(|I_u|)
is scattered back through the same edges to update y. This matches the
reference's gradient up to holding s fixed within a group (the
reference recomputes s per rating) — minibatch semantics, validated by
held-out RMSE.

History edges I_u = training items of u plus AdditionalFeedback
(transductive test-user histories, reference ITransductiveRatingPredictor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def prepare_groups(ratings, hist_user, hist_item, num_users: int,
                   num_items: int, group_users: int = 16_384):
    """Host-side layout: ratings and history edges grouped by contiguous
    user-id ranges, padded to rectangular [ngroups, *] arrays."""
    users = np.asarray(ratings.users, dtype=np.int32)
    items = np.asarray(ratings.items, dtype=np.int32)
    values = np.asarray(ratings.values, dtype=np.float32)
    hist_user = np.asarray(hist_user, dtype=np.int32)
    hist_item = np.asarray(hist_item, dtype=np.int32)

    G = group_users
    ngroups = max((num_users + G - 1) // G, 1)

    def grouped(u_ids, *arrays, fill=0):
        g_of = u_ids // G
        order = np.argsort(g_of, kind="stable")
        counts = np.bincount(g_of, minlength=ngroups)
        L = max(int(counts.max()), 1)
        out = []
        for arr in (u_ids,) + arrays:
            a = arr[order]
            buf = np.full((ngroups, L), fill, dtype=a.dtype)
            pos = 0
            for g in range(ngroups):
                buf[g, :counts[g]] = a[pos:pos + counts[g]]
                pos += counts[g]
            out.append(buf)
        mask = np.zeros((ngroups, L), dtype=np.float32)
        for g in range(ngroups):
            mask[g, :counts[g]] = 1.0
        return out, mask

    (ru, ri, rv), rmask = grouped(users, items, values)
    (eu, ei), emask = grouped(hist_user, hist_item)

    hist_count = np.bincount(hist_user, minlength=num_users).astype(np.float32)
    inv_sqrt_hist = np.where(hist_count > 0, 1.0 / np.sqrt(
        np.maximum(hist_count, 1.0)), 0.0).astype(np.float32)

    return dict(
        r_user=jnp.asarray(ru), r_item=jnp.asarray(ri),
        r_value=jnp.asarray(rv), r_mask=jnp.asarray(rmask),
        e_user=jnp.asarray(eu), e_item=jnp.asarray(ei),
        e_mask=jnp.asarray(emask),
        inv_sqrt_hist=jnp.asarray(inv_sqrt_hist),
    ), dict(ngroups=ngroups, group_users=G)


@functools.partial(
    jax.jit,
    static_argnames=("group_users", "ngroups", "loss", "sigmoid",
                     "use_p", "update_user", "update_item", "use_attrs"),
    donate_argnames=("params",))
def svdpp_epoch(params, data, hp, *, group_users: int, ngroups: int,
                loss: int, sigmoid: bool, use_p: bool,
                update_user: bool, update_item: bool,
                use_attrs: bool = False):
    """One pass over all user groups.

    params: global_bias, user_bias [U], item_bias [I], item_factors(q)
            [I,f], y [I,f], optionally p [U,f]; plus reg arrays
            y_reg [I], user_reg [U], item_reg [I] inside hp-like 'regs'.
    hp: learn_rate, bias_learn_rate, bias_reg, min_rating, rating_range.
    """
    from mymedialite_tpu.ops.sgd import _gradient_common
    G = group_users
    lr = hp["learn_rate"]

    def group_step(p_, g):
        u0 = g * G
        # --- per-user implicit vector s for this group ---
        e_u = data["e_user"][g] - u0          # local user ids
        e_i = data["e_item"][g]
        e_m = data["e_mask"][g]
        y_rows = p_["y"][e_i] * e_m[:, None]
        s = jax.ops.segment_sum(y_rows, e_u, num_segments=G)  # [G, f]
        inv_sqrt = jax.lax.dynamic_slice(data["inv_sqrt_hist"], (u0,), (G,))
        s = s * inv_sqrt[:, None]
        if use_p:
            p_slab = jax.lax.dynamic_slice(
                p_["p"], (u0, 0), (G, p_["p"].shape[1]))
        else:
            p_slab = None

        # --- the group's ratings, in chunks (the y-part of s stays fixed
        # within the group, but p/q/biases refresh per chunk — bounding
        # the aggregated step size like the reference's sequential SGD;
        # one whole-group update diverges at 1M-rating scale) ---
        L = data["r_user"].shape[1]
        C = min(4096, L)
        n_chunks = (L + C - 1) // C
        bu_slab = jax.lax.dynamic_slice(p_["user_bias"], (u0,), (G,))
        u_reg_slab = jax.lax.dynamic_slice(hp["user_reg"], (u0,), (G,))
        f = p_["y"].shape[1]
        c_acc0 = jnp.zeros((G, f), dtype=jnp.float32)
        n_acc0 = jnp.zeros((G,), dtype=jnp.float32)

        def chunk_step(carry, cidx):
            p_, bu_slab, p_slab_c, c_acc, n_acc = carry
            start = cidx * C
            ru = jax.lax.dynamic_slice(data["r_user"][g], (start,), (C,)) - u0
            ri = jax.lax.dynamic_slice(data["r_item"][g], (start,), (C,))
            rv = jax.lax.dynamic_slice(data["r_value"][g], (start,), (C,))
            rm = jax.lax.dynamic_slice(data["r_mask"][g], (start,), (C,))
            ru = jnp.clip(ru, 0, G - 1)

            if use_p:
                su = s[ru] + p_slab_c[ru]
            else:
                su = s[ru]
            qi_raw = p_["item_factors"][ri]
            if use_attrs:
                # gSVD++ (GSVDPlusPlus.cs:115-128): effective item factor
                # q_i + mean of the item's attribute factors x_a
                A_rows = data["attr_norm"][ri]
                qi = qi_raw + jnp.dot(A_rows, p_["x"],
                                      preferred_element_type=jnp.float32)
            else:
                qi = qi_raw
            score = p_["global_bias"] + bu_slab[ru] + p_["item_bias"][ri] + \
                jnp.sum(su * qi, axis=-1)
            if sigmoid:
                sig = jax.nn.sigmoid(score)
                pred = hp["min_rating"] + sig * hp["rating_range"]
                err = (rv - pred)
                gcom = _gradient_common(loss, err, sig,
                                        hp["rating_range"]) * rm
            else:
                err = rv - score
                gcom = err * rm

            u_reg = u_reg_slab[ru]
            i_reg = hp["item_reg"][ri]

            if update_user:
                d_bu = hp["bias_learn_rate"] * lr * (
                    gcom - hp["bias_reg"] * u_reg * rm * bu_slab[ru])
                bu_slab = bu_slab + jax.ops.segment_sum(d_bu, ru,
                                                        num_segments=G)
            if update_item:
                d_bi = hp["bias_learn_rate"] * lr * (
                    gcom - hp["bias_reg"] * i_reg * rm * p_["item_bias"][ri])
                p_["item_bias"] = p_["item_bias"].at[ri].add(d_bi)

            # p update (reference: delta_u = err * q_i - reg * p_u)
            if use_p and update_user:
                d_p = gcom[:, None] * qi - (rm * u_reg)[:, None] * p_slab_c[ru]
                p_slab_c = p_slab_c + lr * jax.ops.segment_sum(
                    d_p, ru, num_segments=G)

            # q update (reference: delta_i = err * s_u - reg * q_i;
            # the reg term uses the RAW q row, GSVDPlusPlus.cs:159)
            if update_item:
                d_q = gcom[:, None] * su - (rm * i_reg)[:, None] * qi_raw
                p_["item_factors"] = p_["item_factors"].at[ri].add(lr * d_q)
                if use_attrs:
                    # x update (GSVDPlusPlus.cs:163-174)
                    A_rows = data["attr_norm"][ri] * rm[:, None]
                    dX = jnp.dot(A_rows.T, gcom[:, None] * su,
                                 preferred_element_type=jnp.float32)
                    occ = jnp.sum(jnp.sign(A_rows), axis=0)
                    dX = dX - (occ * hp["x_reg"])[:, None] * p_["x"]
                    p_["x"] = p_["x"] + lr * dX
                # accumulate the y-update coefficients
                c_acc = c_acc + jax.ops.segment_sum(
                    (gcom * inv_sqrt[ru])[:, None] * qi, ru, num_segments=G)
                n_acc = n_acc + jax.ops.segment_sum(rm, ru, num_segments=G)
            return (p_, bu_slab, p_slab_c, c_acc, n_acc), None

        p_slab_c = p_slab if use_p else jnp.zeros((G, f), dtype=jnp.float32)
        (p_, bu_slab, p_slab_c, c_acc, n_acc), _ = jax.lax.scan(
            chunk_step, (p_, bu_slab, p_slab_c, c_acc0, n_acc0),
            jnp.arange(n_chunks, dtype=jnp.int32))
        if update_user:
            p_["user_bias"] = jax.lax.dynamic_update_slice(
                p_["user_bias"], bu_slab, (u0,))
            if use_p:
                p_["p"] = jax.lax.dynamic_update_slice(p_["p"], p_slab_c,
                                                       (u0, 0))

        # --- y update through the history edges (once per group) ---
        # c_u = sum over the user's ratings of err * q_i / sqrt(|I_u|)
        if update_item:
            y_rows_now = p_["y"][e_i]
            d_y = e_m[:, None] * (
                c_acc[e_u] - (n_acc[e_u] * hp["y_reg"][e_i])[:, None]
                * y_rows_now)
            p_["y"] = p_["y"].at[e_i].add(lr * d_y)
        return p_, None

    params, _ = jax.lax.scan(group_step, params,
                             jnp.arange(ngroups, dtype=jnp.int32))
    return params


@functools.partial(jax.jit, static_argnames=("group_users", "ngroups",
                                             "use_p"))
def precompute_user_factors(params, data, *, group_users: int, ngroups: int,
                            use_p: bool):
    """Materialize the per-user factor vectors s_u (+ p_u) for fast
    prediction (reference PrecomputeUserFactors, SVDPlusPlus.cs:216-245)."""
    G = group_users
    f = params["y"].shape[1]

    def group(g):
        u0 = g * G
        e_u = data["e_user"][g] - u0
        e_i = data["e_item"][g]
        e_m = data["e_mask"][g]
        y_rows = params["y"][e_i] * e_m[:, None]
        s = jax.ops.segment_sum(y_rows, e_u, num_segments=G)
        inv_sqrt = jax.lax.dynamic_slice(data["inv_sqrt_hist"], (u0,), (G,))
        s = s * inv_sqrt[:, None]
        if use_p:
            s = s + jax.lax.dynamic_slice(params["p"], (u0, 0), (G, f))
        return s

    out = jax.lax.map(group, jnp.arange(ngroups, dtype=jnp.int32))
    return out.reshape(ngroups * G, f)
