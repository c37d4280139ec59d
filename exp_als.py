"""Experiment: WRMF ALS throughput breakdown (ops/als.py).

Hypothesis: the 3.17M ratings/s alternation is latency-bound — the
solve_chunk=256 cap turns each bucket into ~O(rows/256) sequential
lax.map steps of tiny batched einsum+solve work. Test larger adaptive
chunks and Cholesky vs LU solves at the Netflix bench shape.

Usage: python exp_als.py   (TPU)
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    U, I, n, f = 480_000, 17_770, 20_000_000, 40
    rng = np.random.default_rng(0)
    users = rng.integers(0, U, n).astype(np.int32)
    items = (np.minimum(rng.zipf(1.3, n), I) - 1).astype(np.int32)

    from mymedialite_tpu.data.arrays import PosOnlyData
    fb = PosOnlyData(users, items, num_users=U, num_items=I)

    from mymedialite_tpu.models.wrmf import WRMF
    m = WRMF()
    m.num_factors = f
    m.feedback = fb
    m.init_model()

    H = m.params["item_factors"]
    alpha, reg = jnp.float32(1.0), jnp.float32(0.015)

    # per-bucket timing of the user-side solve (the bigger side)
    print("user-side buckets:", flush=True)
    total = 0.0
    for rows, (hist, lens), chunk in m._user_hist:
        from mymedialite_tpu.ops.als import wrmf_optimize
        L = hist.shape[1]
        Wb = wrmf_optimize(H, hist, lens, alpha, reg, chunk=chunk)
        float(jnp.sum(Wb[0]))
        t0 = time.time()
        Wb = wrmf_optimize(H, hist, lens, alpha, reg, chunk=chunk)
        float(jnp.sum(Wb[0]))
        dt = time.time() - t0
        total += dt
        print(f"  L={L:6d} rows={rows.size:7d} chunk={chunk:5d} "
              f"steps={hist.shape[0]//chunk:5d}  {dt*1000:8.1f} ms",
              flush=True)
    print(f"user side total: {total:.2f}s", flush=True)

    # full alternation through the model (current production path)
    m.iterate()
    t0 = time.time()
    m.iterate()
    float(jnp.sum(m.params["user_factors"][:8]))
    dt = time.time() - t0
    print(f"current production alternation: {dt:.2f}s -> "
          f"{n/dt/1e6:.2f}M ratings/s", flush=True)

    variants(m, H, alpha, reg)


def variants(m, H, alpha, reg):
    """Candidate optimizations on the user-side buckets: adaptive chunk
    (min sequential steps) and Cholesky instead of LU solves."""
    import functools

    import jax
    import jax.numpy as jnp

    I = H.shape[0]

    def optimize_v2(H, hist, lens, alpha, reg, chunk, solver: str):
        U, L = hist.shape
        f = H.shape[1]
        HH = H.T @ H
        eye = jnp.eye(f, dtype=H.dtype)

        def solve_chunk(args):
            h, l = args
            Hs = H[jnp.clip(h, 0, H.shape[0] - 1)]
            mask = (jnp.arange(L)[None, :] < l[:, None]).astype(H.dtype)
            Hsm = Hs * mask[..., None]
            M = HH[None] + alpha * jnp.einsum(
                "clf,clg->cfg", Hsm, Hsm,
                preferred_element_type=jnp.float32) + reg * eye[None]
            b = (1.0 + alpha) * jnp.sum(Hsm, axis=1)
            if solver == "chol":
                Lc = jnp.linalg.cholesky(M)
                y = jax.lax.linalg.triangular_solve(
                    Lc, b[..., None], left_side=True, lower=True)
                x = jax.lax.linalg.triangular_solve(
                    Lc, y, left_side=True, lower=True,
                    transpose_a=True)
                return x[..., 0]
            if solver == "gram_only":
                return jnp.sum(M, axis=2) + b
            return jnp.linalg.solve(M, b[..., None])[..., 0]

        if hist.shape[0] == chunk:
            return solve_chunk((hist, lens))
        W = jax.lax.map(solve_chunk,
                        (hist.reshape(-1, chunk, L),
                         lens.reshape(-1, chunk)))
        return W.reshape(U, f)

    jfn = jax.jit(optimize_v2, static_argnames=("chunk", "solver"))

    for solver in ("lu", "chol", "gram_only"):
        for target in (256, 2048, 8192):
            total = 0.0
            for rows, (hist, lens), chunk in m._user_hist:
                L = hist.shape[1]
                cap = max(2_097_152 // L, 8)
                c = min(1 << (cap.bit_length() - 1), target)
                # repad rows to the new chunk multiple
                nb = hist.shape[0]
                nb2 = ((nb + c - 1) // c) * c
                if nb2 != nb:
                    hist = jnp.pad(hist, ((0, nb2 - nb), (0, 0)))
                    lens = jnp.pad(lens, (0, nb2 - nb))
                Wb = jfn(H, hist, lens, alpha, reg, chunk=c, solver=solver)
                float(jnp.sum(Wb[0]))
                t0 = time.time()
                Wb = jfn(H, hist, lens, alpha, reg, chunk=c, solver=solver)
                float(jnp.sum(Wb[0]))
                total += time.time() - t0
            print(f"  solver={solver:9s} target_chunk={target:5d}: "
                  f"user side {total*1000:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
