"""SGD inner-loop experiment: find the fastest update strategy on TPU.

Variants of the blocked-epoch batch step (ops/sgd.py sgd_epoch_blocked):
  A current   : slab.at[u].add + H.at[i].add (duplicate indices)
  B gather    : gathers + math only, no updates (upper bound)
  C seg_user  : batch sorted by user -> user side via sorted segment_sum
                + dense add; item side unchanged
  D dedup_item: C + item side via per-batch sorted-unique dedup scatter
Prints one line per variant: updates/s.
"""

import os
import time

import numpy as np

N_USERS = int(os.environ.get("E_USERS", 480_000))
N_ITEMS = int(os.environ.get("E_ITEMS", 17_770))
N_RATINGS = int(os.environ.get("E_RATINGS", 5_000_000))
F = int(os.environ.get("E_F", 40))
B = int(os.environ.get("E_B", 131_072))
G = int(os.environ.get("E_G", 16_384))
REPS = int(os.environ.get("E_REPS", 3))


def main():
    import jax
    import jax.numpy as jnp
    from mymedialite_tpu.ops import sgd

    rng = np.random.default_rng(0)
    users = rng.integers(0, N_USERS, N_RATINGS).astype(np.int32)
    items = rng.integers(0, N_ITEMS, N_RATINGS).astype(np.int32)
    values = rng.uniform(1.0, 5.0, N_RATINGS).astype(np.float32)

    data, meta = sgd.prepare_blocked_data(users, items, values, N_USERS,
                                          B, G, shuffle_seed=0)
    ngroups, Lpad = meta["ngroups"], meta["l_pad"]
    nb = Lpad // meta["batch"]
    Bb = meta["batch"]
    n_eff = ngroups * Lpad
    fe = F + 2

    # sorted-by-user within each batch + per-batch item dedup
    gu = np.asarray(data["gu"]); gi = np.asarray(data["gi"])
    gv = np.asarray(data["gv"]); gw = np.asarray(data["gw"])
    gu_s = gu.copy(); gi_s = gi.copy(); gv_s = gv.copy(); gw_s = gw.copy()
    gi_slot = np.zeros_like(gi); gi_uniq = np.zeros_like(gi)
    for g in range(ngroups):
        for b in range(nb):
            s = slice(b * Bb, (b + 1) * Bb)
            o = np.argsort(gu[g, s], kind="stable")
            gu_s[g, s] = gu[g, s][o]; gi_s[g, s] = gi[g, s][o]
            gv_s[g, s] = gv[g, s][o]; gw_s[g, s] = gw[g, s][o]
            uniq, inv = np.unique(gi_s[g, s], return_inverse=True)
            k = uniq.shape[0]
            gi_slot[g, s] = inv
            tmp = np.empty(Bb, np.int32)
            tmp[:k] = uniq
            tmp[k:] = N_ITEMS + np.arange(Bb - k)
            gi_uniq[g, s] = tmp
    dsort = dict(gu=jnp.asarray(gu_s), gi=jnp.asarray(gi_s),
                 gv=jnp.asarray(gv_s), gw=jnp.asarray(gw_s),
                 gslot=jnp.asarray(gi_slot), guniq=jnp.asarray(gi_uniq))

    W = jnp.asarray(0.1 * rng.standard_normal(
        (ngroups * G, fe)).astype(np.float32))
    H = jnp.asarray(0.1 * rng.standard_normal(
        (N_ITEMS, fe)).astype(np.float32))
    lrv = jnp.full((fe,), 0.005, jnp.float32)

    def make_epoch(variant):
        def batch_math(slab, H, u, i, v, w):
            wu = slab[u]
            hi = H[i]
            err = (v - jnp.sum(wu * hi, -1)) * w
            dw = lrv * (err[:, None] * hi - 0.015 * w[:, None] * wu)
            dh = lrv * (err[:, None] * wu - 0.015 * w[:, None] * hi)
            return dw, dh

        def group_step(carry, g):
            W, H = carry
            slab = jax.lax.dynamic_slice(W, (g * G, 0), (G, fe))

            def batch_step(inner, b):
                slab, H = inner
                start = b * Bb
                dd = dsort if variant in ("C", "D") else data
                u = jax.lax.dynamic_slice(dd["gu"][g], (start,), (Bb,))
                i = jax.lax.dynamic_slice(dd["gi"][g], (start,), (Bb,))
                v = jax.lax.dynamic_slice(dd["gv"][g], (start,), (Bb,))
                w = jax.lax.dynamic_slice(dd["gw"][g], (start,), (Bb,))
                dw, dh = batch_math(slab, H, u, i, v, w)
                if variant == "A":
                    slab = slab.at[u].add(dw)
                    H = H.at[i].add(dh)
                elif variant == "B":
                    # no updates: fold deltas into a cheap reduction so
                    # XLA can't DCE the math
                    slab = slab + jnp.sum(dw) * 1e-20
                    H = H + jnp.sum(dh) * 1e-20
                elif variant in ("C", "D"):
                    seg = jax.ops.segment_sum(dw, u, num_segments=G,
                                              indices_are_sorted=True)
                    slab = slab + seg
                    if variant == "C":
                        H = H.at[i].add(dh)
                    else:
                        slot = jax.lax.dynamic_slice(
                            dsort["gslot"][g], (start,), (Bb,))
                        uniq = jax.lax.dynamic_slice(
                            dsort["guniq"][g], (start,), (Bb,))
                        segh = jax.ops.segment_sum(dh, slot, num_segments=Bb)
                        H = H.at[uniq].add(segh, indices_are_sorted=True,
                                           unique_indices=True, mode="drop")
                return (slab, H), None

            (slab, H), _ = jax.lax.scan(batch_step, (slab, H),
                                        jnp.arange(nb, dtype=jnp.int32))
            W = jax.lax.dynamic_update_slice(W, slab, (g * G, 0))
            return (W, H), None

        def epoch(W, H):
            (W, H), _ = jax.lax.scan(group_step, (W, H),
                                     jnp.arange(ngroups, dtype=jnp.int32))
            return W, H
        return jax.jit(epoch, donate_argnums=(0, 1))

    for variant in ("A", "B", "C", "D"):
        ep = make_epoch(variant)
        Wv, Hv = jnp.array(W), jnp.array(H)
        Wv, Hv = ep(Wv, Hv)  # compile + warm
        _ = float(jnp.sum(Hv[0]))  # sync (block_until_ready lies over tunnel)
        t0 = time.time()
        for _ in range(REPS):
            Wv, Hv = ep(Wv, Hv)
        _ = float(jnp.sum(Hv[0]))
        dt = (time.time() - t0) / REPS
        print(f"{variant}: {n_eff/dt/1e6:8.1f} M updates/s   "
              f"({dt*1000:.1f} ms/epoch, n_eff={n_eff/1e6:.1f}M)", flush=True)


if __name__ == "__main__":
    main()
