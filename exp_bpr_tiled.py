"""Tiled-BPR throughput experiment: chunk size x sampler config.

The r3/r4 big-catalog BPR number sits at ~5.4M triples/s regardless of
the membership-test redesign, pointing at padding/fixed-cost trade as
the real lever: avg bucket occupancy at the KDD shape is ~210 events,
so chunk=512 processes ~2.4x padded slots while chunk=128 pays the
per-chunk fixed cost ~4x as often. This sweeps chunk x trials on the
real chip and records triples/s + padding so the production
chunk_overhead constant is a measured choice (VERDICT r3 #2).

Usage: python exp_bpr_tiled.py [chunks...]   (default 128 256 512)
"""

import sys
import time

import numpy as np

U, I, N, F = 62_561, 624_961, 15_800_017, 40


def run(chunk, trials=8, epochs=2):
    import jax
    import jax.numpy as jnp

    from mymedialite_tpu.data.arrays import PosOnlyData
    from mymedialite_tpu.ops import pallas_bpr as pb
    from mymedialite_tpu.ops import pallas_sgd as ps

    rng = np.random.default_rng(6)
    users = rng.integers(0, U, N).astype(np.int32)
    items = (np.minimum(rng.zipf(1.2, N), I) - 1).astype(np.int32)
    fb = PosOnlyData(users, items, num_users=U, num_items=I)

    t0 = time.time()
    plan, neg_state, neg_meta = pb.prepare_bpr_mxu(
        fb, uniform_user=True, shuffle_seed=0, num_neg_trials=trials,
        chunk=chunk, kcap=128, subkeys=True, ksub_cap=256,
        bitmask=False, chunk_overhead=0)
    n_ib, _, _, num_items, IB = neg_meta
    Ksub = neg_state["ksub"]
    sb = max(ps.default_slab_blocks(F) // 2, 1)
    packed_ext, S, n_pass, P, slab_items = pb.bpr_tiled_plan(
        plan, neg_state["nvalid"], slab_blocks=sb)
    pad = plan.num_chunks * plan.chunk / N - 1
    print(f"chunk={plan.chunk} trials={trials}: prep {time.time()-t0:.0f}s "
          f"nc={plan.num_chunks} pad={pad:.0%} Ksub={Ksub} "
          f"trunc={neg_state['subkey_truncation']:.2%} "
          f"corrupt={neg_state['subkey_corruption']:.2e}", flush=True)

    f, fe = F, 64
    We, He = pb.bpr_tables_to_mxu(
        jnp.asarray(0.1 * rng.standard_normal((U, f)), jnp.float32),
        jnp.asarray(0.1 * rng.standard_normal((I, f)), jnp.float32),
        jnp.zeros(I), jnp.asarray(plan.new_of_old),
        u_pad=plan.u_pad, i_pad=S * sb * plan.item_block, fe=fe)
    rates = pb.bpr_mxu_column_rates(f, fe, 0.05, 0.0025, 0.0025,
                                    0.00025, 0.0, True)
    slab_rows = sb * plan.item_block
    meta = (P, plan.chunk, plan.user_block, plan.item_block,
            plan.n_ublocks, slab_rows, fe, Ksub, trials)

    def epoch(We, He, seed):
        order = pb.bpr_tiled_epoch_order(
            plan, neg_state["nvalid"], slab_items, slab_blocks=sb,
            num_slabs=S, num_passes=n_pass, pass_len=P,
            num_items=num_items, seed=seed)
        bits = pb.epoch_random_bits(
            jax.random.PRNGKey(seed), nc=n_pass * P, trials=trials,
            C=plan.chunk).reshape(n_pass, P, trials, plan.chunk)
        return pb.bpr_epoch_mxu_tiled(
            We, He, packed_ext, neg_state["subkeys_tbl"],
            neg_state["cdf_tbl"], bits, order, rates, meta=meta,
            num_slabs=S, subkeys=True)

    t0 = time.time()
    We, He, _ = epoch(We, He, 0)
    float(jnp.sum(He[0]))
    print(f"  warmup+compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    for e in range(epochs):
        We, He, _ = epoch(We, He, e + 1)
    float(jnp.sum(He[0]))
    el = time.time() - t0
    print(f"  RESULT chunk={plan.chunk} trials={trials}: "
          f"{epochs * N / el / 1e6:.2f}M triples/s "
          f"({epochs} epochs in {el:.1f}s; slots/s "
          f"{epochs * plan.num_chunks * plan.chunk / el / 1e6:.1f}M)",
          flush=True)


if __name__ == "__main__":
    chunks = [int(a) for a in sys.argv[1:] if a.isdigit()] or \
        [128, 256, 512]
    for c in chunks:
        run(c)
