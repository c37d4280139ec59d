"""BPR-family item recommenders.

TPU-native counterparts of reference
``ItemRecommendation/MF.cs:29`` (abstract implicit-MF base),
``BPRMF.cs:73`` (the flagship ranking model),
``WeightedBPRMF.cs:32`` (WBPR popularity sampling),
``SoftMarginRankingMF.cs:52`` (hinge loss),
``MultiCoreBPRMF.cs:30`` (hogwild parallel BPR — here the same jitted
minibatch path; XLA + sharding provide the parallelism).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from mymedialite_tpu.io.model_io import ModelReader, ModelWriter
from mymedialite_tpu.models.base import (
    FoldInItemRecommender, IncrementalItemRecommender, IterativeModel,
)
from mymedialite_tpu.ops import bpr as bpr_ops


def _itemmf_catalog(params, users):
    """Pure catalog scorer for implicit-MF models (module-level: stable
    jit identity; see Recommender.catalog_scorer)."""
    u = jnp.clip(users, 0, params["user_factors"].shape[0] - 1)
    score = params["user_factors"][u] @ params["item_factors"].T
    if "item_bias" in params:
        score = score + params["item_bias"][None, :]
    return score


class ItemMF(IncrementalItemRecommender, IterativeModel):
    """Shared factor storage / init / predict / save-load for implicit-MF
    models (reference ItemRecommendation/MF.cs:29-196)."""

    EXTRA_PARAMS = {
        "init_mean": float,
        "init_stdev": float,
        "batch_size": int,
        "mxu_dtype": str,
    }

    def __init__(self):
        super().__init__()
        self.num_factors = 10
        self.num_iter = 30
        self.init_mean = 0.0
        self.init_stdev = 0.1
        self.batch_size = 8192
        # MXU operand dtype for the Pallas epochs ('bf16' production
        # default / 'f32'); measured quality trade recorded in BASELINE
        self.mxu_dtype = "bf16"
        self.random_seed = 42
        self.params = None
        self._key = None

    # --- params with lazy MXU-layout materialization ------------------
    #
    # The MXU epochs keep their kernel-layout tables resident across
    # iterate() calls (self._mxu_tables): converting per epoch costs
    # more than the epoch itself at big catalogs (scatter/gather of
    # ~625k rows measured 2.6 + 1.2 s vs 0.32 s for the kernel,
    # 2026-08-21). Any read of .params materializes the std layout —
    # and conservatively invalidates the table cache, since callers may
    # mutate the returned dict in place (retrain_user etc. do).

    @property
    def params(self):
        tabs = getattr(self, "_mxu_tables", None)
        if tabs is not None:
            self._params = self._materialize_params(tabs)
            self._mxu_tables = None
        return self._params

    @params.setter
    def params(self, value):
        self._params = value
        self._mxu_tables = None

    def _materialize_params(self, tabs):
        raise NotImplementedError  # overridden by the MXU-epoch models

    def init_model(self):
        from mymedialite_tpu.utils import rand
        f = self.feedback
        key = jax.random.PRNGKey(self.random_seed)
        self._key, ku, ki = jax.random.split(key, 3)
        self.params = dict(
            user_factors=self.init_mean + self.init_stdev * rand.normal(
                ku, (f.num_users, self.num_factors)),
            item_factors=self.init_mean + self.init_stdev * rand.normal(
                ki, (f.num_items, self.num_factors)),
        )

    def train(self):
        self.init_model()
        for _ in range(self.num_iter):
            self.iterate()

    def iterate(self):
        raise NotImplementedError

    def predict_batch(self, users, items):
        p = self.params
        U, I = p["user_factors"].shape[0], p["item_factors"].shape[0]
        u = jnp.asarray(users, dtype=jnp.int32)
        i = jnp.asarray(items, dtype=jnp.int32)
        ok = (u >= 0) & (u < U) & (i >= 0) & (i < I)
        uc = jnp.clip(u, 0, U - 1)
        ic = jnp.clip(i, 0, I - 1)
        score = jnp.sum(p["user_factors"][uc] * p["item_factors"][ic], axis=-1)
        if "item_bias" in p:
            score = score + p["item_bias"][ic]
        # unknown entities score float.MinValue (reference MF.Predict/BPRMF)
        return np.asarray(jnp.where(ok, score, -np.float32(3.4e38)))

    def catalog_scorer(self):
        if self.params is None:
            raise RuntimeError(f"{type(self).__name__}: model not trained")
        p = self.params
        params = dict(user_factors=p["user_factors"],
                      item_factors=p["item_factors"])
        if "item_bias" in p:
            params["item_bias"] = p["item_bias"]
        return _itemmf_catalog, params

    def score_catalog(self, users):
        return np.asarray(self.score_catalog_device(users))

    def save_model(self, path):
        with ModelWriter(path, type(self).__name__, "2.99") as w:
            w.matrix(np.asarray(self.params["user_factors"]))
            if "item_bias" in self.params:
                w.vector(np.asarray(self.params["item_bias"]))
            w.matrix(np.asarray(self.params["item_factors"]))

    def load_model(self, path):
        has_bias = "item_bias" in (self.params or {}) or self.HAS_ITEM_BIAS
        with ModelReader(path, type(self).__name__) as r:
            wu = r.matrix()
            bias = r.vector() if has_bias else None
            hi = r.matrix()
        if wu.shape[1] != hi.shape[1]:
            raise IOError("number of user and item factors must match")
        self.num_factors = wu.shape[1]
        self.num_users_trained = wu.shape[0]
        self.num_items_trained = hi.shape[0]
        self.params = dict(user_factors=jnp.asarray(wu),
                           item_factors=jnp.asarray(hi))
        if bias is not None:
            self.params["item_bias"] = jnp.asarray(bias)
        self._key = jax.random.PRNGKey(self.random_seed)

    HAS_ITEM_BIAS = False


class BPRMF(ItemMF, FoldInItemRecommender):
    """Bayesian Personalized Ranking MF (reference BPRMF.cs:73-553).

    SGD over sampled (user, pos-item, neg-item) triples; four sampling
    regimes; item bias; separate RegU/RegI/RegJ. One iteration performs
    |feedback| triple updates, minibatched on device.
    """

    HYPERPARAMS = {
        "num_factors": int,
        "bias_reg": float,
        "reg_u": float,
        "reg_i": float,
        "reg_j": float,
        "num_iter": int,
        "learn_rate": float,
        "uniform_user_sampling": bool,
        "with_replacement": bool,
        "update_j": bool,
    }
    EXTRA_PARAMS = dict(ItemMF.EXTRA_PARAMS, num_neg_trials=int)

    HAS_ITEM_BIAS = True
    SOFT_MARGIN = False

    def __init__(self):
        super().__init__()
        # defaults per reference BPRMF.cs:78-101
        self.bias_reg = 0.0
        self.reg_u = 0.0025
        self.reg_i = 0.0025
        self.reg_j = 0.00025
        self.learn_rate = 0.05
        self.uniform_user_sampling = True
        self.with_replacement = False
        self.update_j = True
        self.num_neg_trials = 8
        self._sampler = None
        self._loss_sample = None

    # incremental-update flags (reference BPRMF ctor: update item factors
    # off by default for online updates)
    update_users = True
    update_items = False

    def _regime(self):
        if self.uniform_user_sampling:
            # with/without replacement collapse to iid uniform-user on
            # device (the reference's without-replacement path is also an
            # iid SampleTriple loop, BPRMF.cs:228-238)
            return bpr_ops.UNIFORM_USER
        return (bpr_ops.UNIFORM_PAIR if self.with_replacement
                else bpr_ops.UNIFORM_PAIR_WOR)

    def _hp(self):
        return dict(learn_rate=jnp.float32(self.learn_rate),
                    reg_u=jnp.float32(self.reg_u),
                    reg_i=jnp.float32(self.reg_i),
                    reg_j=jnp.float32(self.reg_j),
                    bias_reg=jnp.float32(self.bias_reg))

    def init_model(self):
        super().init_model()
        self.params["item_bias"] = jnp.zeros(self.feedback.num_items,
                                             dtype=jnp.float32)
        self._build_epoch_state()

    def _build_epoch_state(self):
        """(Re)build all feedback-derived training state: the XLA sampler
        arrays, the WBPR popularity CDF, the MXU-plan dirty flag, and the
        fixed convergence-loss triple sample (reference BPRMF.cs:135-150:
        sqrt(|U|) * 100 triples)."""
        self._sampler, meta = bpr_ops.make_sampler_data(
            self.feedback, self.num_neg_trials)
        self._meta = meta
        self._pop_cdf = self._make_pop_cdf()
        self._bpr_plan = None
        self._bpr_dirty = True
        n_sample = int(math.isqrt(max(self.feedback.num_users - 1, 1))) * 100
        self._key, sub = jax.random.split(self._key)
        u, i, j, w = bpr_ops._sample_triples(
            sub, self._sampler, dict(meta), max(n_sample, 1),
            bpr_ops.UNIFORM_USER)
        self._loss_sample = (u, i, j)

    def _ensure_epoch_ready(self):
        """Lazily rebuild feedback-derived state when missing — e.g. after
        ``load_model`` — so ``iterate()``/``compute_objective()`` keep
        working without a fresh ``train()`` (reference Model.Load
        re-creates a recommender that can keep training, IO/Model.cs:67-83;
        the CLI's --load-model + --find-iter flow). Mirrors
        models/mf.py's _ensure_epoch_ready for the rating-MF family."""
        if self._sampler is not None:
            return
        if self.feedback is None:
            raise RuntimeError(
                f"{type(self).__name__}: no feedback set; assign "
                ".feedback before iterating a loaded model")
        self._grow_tables()
        self._build_epoch_state()

    def _make_pop_cdf(self):
        return None

    # --- Pallas MXU epoch (ops/pallas_bpr.py) ---

    # WBPR popularity negatives (set by WeightedBPRMF): the fused kernel
    # draws the block by popularity mass and the local index by
    # inverse-CDF (ops/pallas_bpr.py), matching WeightedBPRMF.cs:55-66
    MXU_POPULARITY = False

    def _mxu_mode(self) -> str:
        """Epoch-kernel selection (ops/kernel_select.py, shared with the
        rating-MF family): 'tpu' = the Pallas MXU one-hot-matmul BPR
        epoch with fused negative sampling (scatter-free; the XLA epoch
        is scatter-bound at ~1.3M triples/s at the Netflix bench shape,
        the MXU epoch measures 82M), 'tiled' = the slab-tiled variant
        for big catalogs, 'sharded' = the mesh-sharded DSGD epoch (the
        production path on any mesh — the reference parallelizes BPR by
        default too, MultiCoreBPRMF.cs:30), '(...)-interpret' = forced
        interpret mode (tests), '' = the XLA minibatch epoch."""
        if self.feedback is None:
            return ""
        from mymedialite_tpu.ops.kernel_select import select_mxu_mode
        return select_mxu_mode(self.feedback.num_items, self.num_factors)

    def _prepare_mxu(self):
        # a new plan means a new item permutation / padding — fold any
        # resident kernel-layout tables back into params first
        if getattr(self, "_mxu_tables", None) is not None:
            self._params = self._materialize_params(self._mxu_tables)
            self._mxu_tables = None
        self._bpr_dirty = False
        self._bpr_plan = None
        self._bpr_mesh = None
        mode = self._mxu_mode()
        if not mode:
            return
        from mymedialite_tpu.ops import pallas_bpr as pb
        from mymedialite_tpu.ops import pallas_sgd as ps
        sharded_tiled = mode.startswith("sharded-tiled")
        tiled = mode.startswith("tiled")
        sharded = mode.startswith("sharded") and not sharded_tiled
        uniform_user = (self.uniform_user_sampling
                        and not self.MXU_POPULARITY)
        if sharded_tiled:
            # mesh x big catalog: DSGD diagonal schedule with each
            # device's item partition in HBM, streamed through VMEM
            # slab by slab (the r4 cliff where this shape fell back to
            # the XLA epoch — VERDICT r4 missing #1)
            from mymedialite_tpu.parallel.mesh import make_mesh
            self._bpr_mesh = make_mesh()
            sb = max(ps.default_slab_blocks(self.num_factors) // 2, 1)
            plan, neg_state, neg_meta = pb.prepare_bpr_mxu_sharded_tiled(
                self.feedback, self._bpr_mesh.devices.size,
                uniform_user=uniform_user, shuffle_seed=self.random_seed,
                num_neg_trials=self.num_neg_trials, slab_blocks=sb)
        elif sharded:
            from mymedialite_tpu.parallel.mesh import make_mesh
            self._bpr_mesh = make_mesh()
            # packed-bitmask eligibility decided inside prepare (actual
            # plan geometry); the incidence tables replicate per device
            plan, neg_state, neg_meta = pb.prepare_bpr_mxu_sharded(
                self.feedback, self._bpr_mesh.devices.size,
                uniform_user=uniform_user, shuffle_seed=self.random_seed,
                num_neg_trials=self.num_neg_trials, bitmask="auto")
        else:
            plan, neg_state, neg_meta = pb.prepare_bpr_mxu(
                self.feedback,
                # WBPR samples (u, i) uniform over events
                # (WeightedBPRMF.cs:58-60) = the one-pass layout with
                # unit weights
                uniform_user=uniform_user,
                shuffle_seed=self.random_seed,
                num_neg_trials=self.num_neg_trials,
                # big catalogs: histogram-optimal chunk + capped
                # membership keys (see prepare_bpr_mxu docstring for the
                # truncation bound argument; the [Kcap, C] rejection
                # compare is the kernel's per-chunk cost ceiling, and
                # the keys table is n_buckets * Kcap * 4B of HBM)
                chunk=None if tiled else 640,
                # tiled: sub-bucketed membership keys (u_loc & 7 split,
                # one exact f32 one-hot gather + [Ksub, C] compares) —
                # ~8x less compare volume than the r3 [Kcap=512, C]
                # path AND 4x the key capacity (8 * 256 per bucket), so
                # the documented ~1e-4 truncation bias disappears for
                # realistic shapes (prepare warns if it does not); the
                # flat keys_tbl stays small, it is unused by the kernel
                kcap=128 if tiled else None,
                subkeys=tiled,
                ksub_cap=256 if tiled else None,
                # the packed-bitmask membership (~4x cheaper fused
                # sampling) is sized inside prepare from the actual
                # plan geometry; the tiled kernel uses sub-bucket keys
                bitmask=False if tiled else "auto",
                # per-chunk fixed cost in slot-equivalents: the
                # 2026-08-21 chunk sweep (exp_bpr_tiled.py, KDD shape,
                # dedup'd sub-bucket keys) measured 19.7 / 41.4 / 35.9 /
                # 35.4M triples/s at chunk 128 / 256 / 384 / 512 —
                # overhead 256 makes the histogram planner land on the
                # measured optimum at this shape and scale with skew
                chunk_overhead=256 if tiled else 0)
        self._bpr_plan = plan
        self._bpr_neg_state = neg_state
        self._bpr_neg_meta = neg_meta
        self._bpr_interpret = mode.endswith("interpret")
        self._bpr_new_of_old = jnp.asarray(plan.new_of_old)
        if tiled:
            # half the SGD slab budget: TWO slab slots live in VMEM
            sb = max(ps.default_slab_blocks(self.num_factors) // 2, 1)
            packed_ext, S, n_pass, P, slab_items = pb.bpr_tiled_plan(
                plan, neg_state["nvalid"], slab_blocks=sb)
            self._bpr_tiled = dict(packed=packed_ext, num_slabs=S,
                                   num_passes=n_pass, pass_len=P,
                                   slab_items=slab_items, slab_blocks=sb)
        else:
            self._bpr_tiled = None

    def _materialize_params(self, tabs):
        from mymedialite_tpu.ops import pallas_bpr as pb
        We, He = tabs
        W, H, bias = pb.bpr_tables_from_mxu(
            We, He, self._bpr_new_of_old,
            num_users=self._mxu_num_users, num_factors=self.num_factors)
        return dict(user_factors=W, item_factors=H, item_bias=bias)

    def _iterate_mxu(self):
        """One epoch through the Pallas kernel: the kernel-layout
        tables stay RESIDENT across iterate() calls (the per-epoch
        scatter/gather layout conversions cost several x the epoch
        itself at big catalogs); negatives are sampled inside the
        kernel from hardware-RNG bits. Reads of .params materialize the
        std layout lazily, so predict / retrain / save-load paths are
        untouched."""
        import numpy as np

        from mymedialite_tpu.ops import pallas_bpr as pb
        plan = self._bpr_plan
        f = self.num_factors
        fe = max(64, ((f + 2 + 7) // 8) * 8)
        tl = getattr(self, "_bpr_tiled", None)
        tabs = getattr(self, "_mxu_tables", None)
        if tabs is not None:
            We, He = tabs
            self._mxu_tables = None     # donated into the epoch below
        else:
            p = self._params
            self._mxu_num_users = p["user_factors"].shape[0]
            We, He = pb.bpr_tables_to_mxu(
                p["user_factors"], p["item_factors"], p["item_bias"],
                self._bpr_new_of_old, u_pad=plan.u_pad,
                i_pad=plan.i_pad, fe=fe)
            if tl is not None:
                # pad the item table to whole slabs ONCE per residency
                i_pad2 = tl["num_slabs"] * tl["slab_blocks"] \
                    * plan.item_block
                if He.shape[0] < i_pad2:
                    He = jnp.concatenate([He, jnp.zeros(
                        (i_pad2 - He.shape[0], He.shape[1]), He.dtype)])
            elif isinstance(plan, (pb.BprShardedPlan,
                                   pb.BprShardedTiledPlan)):
                from jax.sharding import NamedSharding, PartitionSpec as P
                sh2 = NamedSharding(self._bpr_mesh, P("data", None))
                We = jax.device_put(We, sh2)
                He = jax.device_put(He, sh2)
        rates = pb.bpr_mxu_column_rates(
            f, fe, self.learn_rate, self.reg_u, self.reg_i, self.reg_j,
            self.bias_reg, self.update_j)
        self._epoch_counter = getattr(self, "_epoch_counter", 0) + 1
        n_ib, Kcap, trials, num_items, _IB = self._bpr_neg_meta
        seed = (self.random_seed + 1) * 1_000_003 + self._epoch_counter
        # sampler bits ride the TPU hardware RNG (threefry measured
        # ~1.2 s per 1.2 GB epoch of bits — comparable to the epoch
        # itself); deterministic per (seed, epoch)
        k_bits = jax.random.key(seed & 0x7FFFFFFF, impl="unsafe_rbg")
        if isinstance(plan, pb.BprShardedTiledPlan):
            from jax.sharding import NamedSharding, PartitionSpec as P
            mesh = self._bpr_mesh
            D = mesh.devices.size
            sh3 = NamedSharding(mesh, P("data", None, None))
            sh5 = NamedSharding(mesh, P("data", None, None, None, None))
            repl = NamedSharding(mesh, P())
            order = plan.epoch_order(
                self._bpr_neg_state["nvalid"], seed,
                block_mass=(self._bpr_neg_state["block_mass"]
                            if self.MXU_POPULARITY else None))
            bits = pb.epoch_random_bits(
                k_bits, nc=D * D * plan.nc_pad, trials=trials,
                C=plan.chunk).reshape(D, D, plan.nc_pad, trials,
                                      plan.chunk)
            o = tuple(jax.device_put(a, sh3) for a in order)
            We, He, _neg = pb.bpr_epoch_mxu_sharded_tiled_jit(
                mesh, We, He,
                jax.device_put(plan.packed, repl),
                jax.device_put(self._bpr_neg_state["subkeys_tbl"], repl),
                jax.device_put(self._bpr_neg_state["cdf_tbl"], repl),
                jax.device_put(bits, sh5), *o, rates,
                meta=plan.meta(fe) + (self._bpr_neg_state["ksub"],
                                      trials),
                slabs_per_part=plan.slabs_per_part,
                soft_margin=self.SOFT_MARGIN, wbpr=self.MXU_POPULARITY,
                mxu_dtype=self.mxu_dtype, interpret=self._bpr_interpret)
        elif isinstance(plan, pb.BprShardedPlan):
            from jax.sharding import NamedSharding, PartitionSpec as P
            mesh = self._bpr_mesh
            D = mesh.devices.size
            sh2 = NamedSharding(mesh, P("data", None))
            sh3 = NamedSharding(mesh, P("data", None, None))
            sh5 = NamedSharding(mesh, P("data", None, None, None, None))
            repl = NamedSharding(mesh, P())
            order = plan.epoch_order(
                self._bpr_neg_state["nvalid"], seed,
                block_mass=(self._bpr_neg_state["block_mass"]
                            if self.MXU_POPULARITY else None))
            bits = pb.epoch_random_bits(
                k_bits, nc=D * D * plan.nc_pad, trials=trials,
                C=plan.chunk).reshape(D, D, plan.nc_pad, trials,
                                      plan.chunk)
            bm = self._bpr_neg_state.get("bitmask_tbl")
            use_bm = bm is not None
            if not use_bm:
                bm = jnp.zeros((1, plan.user_block, plan.item_block // 8),
                               jnp.int8)
            ub, ibk, jb, jbg, nval, bkt, row = (
                jax.device_put(a, sh3) for a in order)
            We, He, _neg = pb.bpr_epoch_mxu_sharded_jit(
                mesh, We, He,
                jax.device_put(plan.packed, repl),
                jax.device_put(self._bpr_neg_state["keys_tbl"], repl),
                jax.device_put(self._bpr_neg_state["cdf_tbl"], repl),
                jax.device_put(bits, sh5),
                ub, ibk, jb, jbg, nval, bkt, row, rates,
                jax.device_put(bm, repl),
                meta=plan.meta(fe) + (Kcap, trials), use_bitmask=use_bm,
                soft_margin=self.SOFT_MARGIN, wbpr=self.MXU_POPULARITY,
                mxu_dtype=self.mxu_dtype, interpret=self._bpr_interpret)
        elif tl is not None:
            if self._bpr_interpret:
                # interpret mode needs host-computed refetch flags
                # (input_output_aliases are not simulated)
                order = pb.bpr_tiled_epoch_order(
                    plan, self._bpr_neg_state["nvalid"],
                    tl["slab_items"], slab_blocks=tl["slab_blocks"],
                    num_slabs=tl["num_slabs"],
                    num_passes=tl["num_passes"], pass_len=tl["pass_len"],
                    num_items=num_items, seed=seed,
                    block_mass=(self._bpr_neg_state["block_mass"]
                                if self.MXU_POPULARITY else None))
            else:
                # real TPU: the whole per-epoch schedule is built
                # on-device (one fused dispatch — the host argsort +
                # transfers measured ~0.2 s/epoch at the KDD shape)
                order = pb.device_bpr_tiled_epoch_order(
                    plan, tl, self._bpr_neg_state["nvalid"],
                    num_items=num_items, seed=seed,
                    block_mass=(self._bpr_neg_state["block_mass"]
                                if self.MXU_POPULARITY else None))
            bits = pb.epoch_random_bits(
                k_bits, nc=tl["num_passes"] * tl["pass_len"],
                trials=trials, C=plan.chunk).reshape(
                tl["num_passes"], tl["pass_len"], trials, plan.chunk)
            slab_rows = tl["slab_blocks"] * plan.item_block
            We, He, _neg = pb.bpr_epoch_mxu_tiled(
                We, He, tl["packed"], self._bpr_neg_state["subkeys_tbl"],
                self._bpr_neg_state["cdf_tbl"], bits, order, rates,
                meta=(tl["pass_len"], plan.chunk, plan.user_block,
                      plan.item_block, plan.n_ublocks, slab_rows, fe,
                      self._bpr_neg_state["ksub"], trials),
                num_slabs=tl["num_slabs"], soft_margin=self.SOFT_MARGIN,
                wbpr=self.MXU_POPULARITY, subkeys=True,
                mxu_dtype=self.mxu_dtype, interpret=self._bpr_interpret)
        else:
            order = plan.epoch_order(seed)
            ub_visit = plan.ub_c[np.asarray(order[2])]
            jb, nval, bkt = pb.epoch_negative_plan(
                plan, self._bpr_neg_state["nvalid"], ub_visit, num_items,
                (self.random_seed + 7) * 999_983 + self._epoch_counter,
                block_mass=(self._bpr_neg_state["block_mass"]
                            if self.MXU_POPULARITY else None))
            bits = pb.epoch_random_bits(k_bits, nc=plan.num_chunks,
                                        trials=trials, C=plan.chunk)
            We, He, _neg = pb.bpr_epoch_mxu(
                We, He, plan.packed, self._bpr_neg_state["keys_tbl"],
                self._bpr_neg_state["cdf_tbl"], bits,
                order, jb, nval, bkt, rates,
                meta=plan.meta(fe) + (Kcap, trials),
                soft_margin=self.SOFT_MARGIN, wbpr=self.MXU_POPULARITY,
                mxu_dtype=self.mxu_dtype, interpret=self._bpr_interpret,
                bm_tbl=self._bpr_neg_state.get("bitmask_tbl"))
        # tables stay resident; .params materializes lazily on read
        self._mxu_tables = (We, He)

    def iterate(self):
        self._ensure_epoch_ready()
        if getattr(self, "_bpr_dirty", True):
            self._prepare_mxu()
        if self._bpr_plan is not None:
            return self._iterate_mxu()
        meta = self._meta
        batch = min(self.batch_size, max(meta["num_events"], 1))
        num_batches = max((meta["num_events"] + batch - 1) // batch, 1)
        self._key, sub = jax.random.split(self._key)
        self.params = bpr_ops.bpr_epoch(
            self.params, self._sampler, sub, self._hp(),
            self._pop_cdf if self._pop_cdf is not None else jnp.zeros(0),
            batch_size=batch, num_batches=num_batches,
            regime=self._regime() if self._pop_cdf is None else bpr_ops.WBPR,
            meta_static=tuple(sorted(meta.items())),
            update_j=self.update_j, soft_margin=self.SOFT_MARGIN)

    def compute_objective(self):
        self._ensure_epoch_ready()
        u, i, j = self._loss_sample
        return float(bpr_ops.bpr_objective(self.params, self._hp(), u, i, j))

    # --- incremental updates (reference BPRMF.cs:391-422) ---

    def _grow_tables(self):
        f = self.feedback
        p = self.params
        grow_u = f.num_users - p["user_factors"].shape[0]
        if grow_u > 0:
            self._key, sub = jax.random.split(self._key)
            rows = self.init_mean + self.init_stdev * jax.random.normal(
                sub, (grow_u, self.num_factors), dtype=jnp.float32)
            p["user_factors"] = jnp.concatenate([p["user_factors"], rows])
        grow_i = f.num_items - p["item_factors"].shape[0]
        if grow_i > 0:
            self._key, sub = jax.random.split(self._key)
            rows = self.init_mean + self.init_stdev * jax.random.normal(
                sub, (grow_i, self.num_factors), dtype=jnp.float32)
            p["item_factors"] = jnp.concatenate([p["item_factors"], rows])
            p["item_bias"] = jnp.concatenate(
                [p["item_bias"], jnp.zeros(grow_i)])
        self.num_users_trained = max(self.num_users_trained, f.num_users)
        self.num_items_trained = max(self.num_items_trained, f.num_items)

    def _retrain(self, users, items):
        if self.params is None:
            return
        self._ensure_epoch_ready()  # loaded model: build full state first
        self._grow_tables()
        self._sampler, self._meta = bpr_ops.make_sampler_data(
            self.feedback, self.num_neg_trials)
        self._pop_cdf = self._make_pop_cdf()
        # the MXU epoch plan buckets the (pre-update) event stream; a
        # subsequent iterate() must train on the CURRENT feedback
        # (reference AddFeedback-then-Iterate contract, BPRMF.cs:129-160)
        self._bpr_dirty = True
        self._bpr_plan = None
        if self.update_users:
            for u in np.unique(np.asarray(users, dtype=np.int64)):
                self.retrain_user(int(u))
        if self.update_items:
            for i in np.unique(np.asarray(items, dtype=np.int64)):
                self.retrain_item(int(i))

    def retrain_user(self, user_id):
        """Fresh row + |I_u| pairwise updates on this user's pairs
        (reference RetrainUser, BPRMF.cs:391-403)."""
        self._key, sub = jax.random.split(self._key)
        row = self.init_mean + self.init_stdev * jax.random.normal(
            sub, (self.num_factors,), dtype=jnp.float32)
        self.params["user_factors"] = \
            self.params["user_factors"].at[user_id].set(row)
        items_u = self.feedback.items_by_user(user_id)
        n = int(items_u.size)
        if n == 0:
            return
        meta = dict(self._meta)
        self._key, k_i, k_j = jax.random.split(self._key, 3)
        pos = jnp.asarray(items_u)[jax.random.randint(k_i, (n,), 0, n)]
        users = jnp.full((n,), user_id, dtype=jnp.int32)
        neg, ok = bpr_ops._sample_negatives(
            k_j, self._sampler, users, meta["num_items"],
            meta["num_neg_trials"], meta["search_depth"])
        self._pairwise_updates(users, pos, neg, ok.astype(jnp.float32),
                               update_u=True, update_i=False, update_j=False)

    def retrain_item(self, item_id):
        """Reference RetrainItem (BPRMF.cs:405-422), vectorized."""
        self._key, sub = jax.random.split(self._key)
        row = self.init_mean + self.init_stdev * jax.random.normal(
            sub, (self.num_factors,), dtype=jnp.float32)
        self.params["item_factors"] = \
            self.params["item_factors"].at[item_id].set(row)
        meta = dict(self._meta)
        n = max(meta["num_events"] // max(meta["num_items"], 1), 1)
        self._key, k_u, k_j = jax.random.split(self._key, 3)
        uidx = jax.random.randint(
            k_u, (n,), 0, self._sampler["valid_users"].shape[0])
        users = self._sampler["valid_users"][uidx]
        # is item_id positive for each sampled user?
        is_pos = bpr_ops._segment_contains(
            self._sampler["hist_items"], self._sampler["indptr"], users,
            jnp.full((n,), item_id, dtype=jnp.int32), meta["search_depth"])
        other, ok = bpr_ops._sample_negatives(
            k_j, self._sampler, users, meta["num_items"],
            meta["num_neg_trials"], meta["search_depth"])
        this = jnp.full((n,), item_id, dtype=jnp.int32)
        pos = jnp.where(is_pos, this, other)
        neg = jnp.where(is_pos, other, this)
        w = ok.astype(jnp.float32)
        self._pairwise_updates(users, pos, neg, w * is_pos,
                               update_u=False, update_i=True, update_j=False)
        self._pairwise_updates(users, pos, neg, w * (~is_pos),
                               update_u=False, update_i=False, update_j=True)

    def _pairwise_updates(self, u, i, j, w, update_u, update_i, update_j):
        p = self.params
        lr = self.learn_rate
        wu = p["user_factors"][u]
        hi = p["item_factors"][i]
        hj = p["item_factors"][j]
        x = p["item_bias"][i] - p["item_bias"][j] + jnp.sum(wu * (hi - hj), -1)
        g = jax.nn.sigmoid(-x) * w
        if update_u:
            p["user_factors"] = p["user_factors"].at[u].add(
                lr * (g[:, None] * (hi - hj) - (w * self.reg_u)[:, None] * wu))
        if update_i:
            p["item_factors"] = p["item_factors"].at[i].add(
                lr * (g[:, None] * wu - (w * self.reg_i)[:, None] * hi))
            p["item_bias"] = p["item_bias"].at[i].add(
                lr * (g - self.bias_reg * w * p["item_bias"][i]))
        if update_j:
            p["item_factors"] = p["item_factors"].at[j].add(
                lr * (-g[:, None] * wu - (w * self.reg_j)[:, None] * hj))
            p["item_bias"] = p["item_bias"].at[j].add(
                lr * (-g - self.bias_reg * w * p["item_bias"][j]))

    # --- fold-in (reference BPRMF.cs:497-542) ---

    def score_items_foldin(self, accessed_items, candidates):
        """Learn a user vector for an unseen user: |I_u| BPR updates per
        iteration over the user's accessed items vs sampled negatives."""
        pos_set = np.unique(np.asarray(list(accessed_items), dtype=np.int32))
        I = self.params["item_factors"].shape[0]
        self._key, sub = jax.random.split(self._key)
        vec = self.init_mean + self.init_stdev * jax.random.normal(
            sub, (self.num_factors,), dtype=jnp.float32)
        neg_pool = np.setdiff1d(np.arange(I, dtype=np.int32), pos_set)
        rng = np.random.default_rng(int(jax.random.randint(sub, (), 0, 2**31 - 1)))
        for _ in range(self.num_iter):
            pos = rng.choice(pos_set, size=pos_set.size)
            neg = rng.choice(neg_pool, size=pos_set.size) if neg_pool.size \
                else pos
            hi = self.params["item_factors"][jnp.asarray(pos)]
            hj = self.params["item_factors"][jnp.asarray(neg)]
            x = self.params["item_bias"][jnp.asarray(pos)] - \
                self.params["item_bias"][jnp.asarray(neg)] + (hi - hj) @ vec
            g = jax.nn.sigmoid(-x)
            vec = vec + self.learn_rate * (
                jnp.sum(g[:, None] * (hi - hj), axis=0)
                - self.reg_u * vec * pos_set.size)
        cand = jnp.asarray(list(candidates), dtype=jnp.int32)
        scores = self.params["item_bias"][cand] + \
            self.params["item_factors"][cand] @ vec
        return [(int(c), float(s)) for c, s in zip(cand, np.asarray(scores))]


class MultiCoreBPRMF(BPRMF):
    """Reference MultiCoreBPRMF.cs:30 — hogwild-parallel BPR over index
    blocks. TPU mapping: with more than one jax device, users are
    range-partitioned across a 1-D mesh; each device samples triples for
    its own users on-device (conflict-free user updates, stronger than
    the reference's tolerated races) and item deltas are psum'd per
    minibatch (ops/bpr.py bpr_epoch_sharded). Single-device, the
    minibatched epoch already is the parallel path."""

    HYPERPARAMS = dict(BPRMF.HYPERPARAMS, max_threads=int)

    def __init__(self):
        super().__init__()
        self.max_threads = 1
        self._mesh = None
        self._sharded = None

    def _setup_mesh(self):
        import jax
        if len(jax.devices()) <= 1:
            return None
        from mymedialite_tpu.parallel.mesh import make_mesh
        self._mesh = make_mesh()
        self._sharded, self._sharded_meta = \
            bpr_ops.make_sampler_data_sharded(
                self.feedback, self._mesh.devices.size, self.num_neg_trials)
        return self._mesh

    def init_model(self):
        super().init_model()
        self._setup_mesh()

    def _ensure_epoch_ready(self):
        rebuilt = self._sampler is None
        super()._ensure_epoch_ready()
        if rebuilt and self._mesh is None:
            self._setup_mesh()

    def iterate(self):
        self._ensure_epoch_ready()
        # the sharded MXU epoch (base-class production path on a mesh,
        # ops/kernel_select.py) beats the XLA sharded epoch ~25x —
        # engage it whenever supported; the psum-merged XLA epoch below
        # stays the fallback for shapes the MXU kernels cannot take
        if getattr(self, "_bpr_dirty", True):
            self._prepare_mxu()
        if self._bpr_plan is not None:
            return self._iterate_mxu()
        if self._mesh is None:
            return super().iterate()
        import jax
        from mymedialite_tpu.parallel.mesh import (
            pad_rows_to_multiple, replicated, row_sharded_2d,
        )
        mesh = self._mesh
        n = mesh.devices.size
        meta = self._sharded_meta
        U = self.params["user_factors"].shape[0]
        W = jax.device_put(
            pad_rows_to_multiple(np.asarray(self.params["user_factors"]),
                                 meta["u_loc"] * n), row_sharded_2d(mesh))
        H = jax.device_put(np.asarray(self.params["item_factors"]),
                           replicated(mesh))
        ib = jax.device_put(np.asarray(self.params["item_bias"]),
                            replicated(mesh))
        # per-device batches sum to one reference iteration (|events|
        # triple updates across the mesh)
        events = max(meta["num_events"], 1)
        batch = min(self.batch_size, max(events // n, 1))
        num_batches = max((events + n * batch - 1) // (n * batch), 1)
        self._key, sub = jax.random.split(self._key)
        out = bpr_ops.bpr_epoch_sharded(
            mesh, dict(user_factors=W, item_factors=H, item_bias=ib),
            self._sharded, sub, self._hp(),
            self._pop_cdf, batch_size=batch, num_batches=num_batches,
            regime=self._regime() if self._pop_cdf is None else bpr_ops.WBPR,
            meta_static=tuple(sorted(meta.items())),
            update_j=self.update_j, soft_margin=self.SOFT_MARGIN)
        self.params["user_factors"] = jnp.asarray(
            np.asarray(out["user_factors"])[:U])
        self.params["item_factors"] = jnp.asarray(
            np.asarray(out["item_factors"]))
        self.params["item_bias"] = jnp.asarray(np.asarray(out["item_bias"]))

    def _retrain(self, users, items):
        super()._retrain(users, items)
        if self._mesh is not None:
            self._setup_mesh()


class WeightedBPRMF(BPRMF):
    """WBPR (reference WeightedBPRMF.cs:32): users sampled by activity
    ((u,i) ~ uniform over events), negatives by popularity."""

    HYPERPARAMS = {
        "num_factors": int,
        "bias_reg": float,
        "reg_u": float,
        "reg_i": float,
        "reg_j": float,
        "num_iter": int,
        "learn_rate": float,
    }

    MXU_POPULARITY = True

    def _make_pop_cdf(self):
        return bpr_ops.popularity_cdf(self.feedback)

    def _regime(self):
        return bpr_ops.WBPR


class SoftMarginRankingMF(BPRMF):
    """Hinge-loss (soft-margin) ranking MF (reference
    SoftMarginRankingMF.cs:52): updates only on margin violation."""

    SOFT_MARGIN = True

    def __init__(self):
        super().__init__()
        self.learn_rate = 0.1  # reference default
