"""BPRMF quality sweep on the BASELINE.md synthetic implicit benchmark.

Iteration / learn-rate / factor sweep (the SGD-table analog for BPR,
VERDICT r1 #8): same data as quality.py's implicit section (ML-1M shape,
6040 x 3706, 500k events, 80/20 split, seed 102/103). Prints one line
per config: AUC / prec@5 / MAP + train time. Scale with E_SCALE (1.0 =
full benchmark shape); runs on whatever platform jax selects (real TPU
under axon, CPU with JAX_PLATFORMS=cpu).
"""

import os
import time

SCALE = float(os.environ.get("E_SCALE", 1.0))


def main():
    import numpy as np  # noqa: F401

    from mymedialite_tpu.data.synthetic import split_posonly, synthetic_posonly
    from mymedialite_tpu.eval.ranking import evaluate_items
    from mymedialite_tpu.models.registry import create_item_recommender
    from mymedialite_tpu.utils.params import configure

    pos = synthetic_posonly(num_users=int(6040 * SCALE) or 60,
                            num_items=int(3706 * SCALE) or 40,
                            num_events=int(500_000 * SCALE) or 4000,
                            seed=102)
    train, test = split_posonly(pos, 0.2, seed=103)
    print(f"# {len(train)} train / {len(test)} test events", flush=True)

    phase = int(os.environ.get("E_PHASE", 1))
    configs = []
    if phase == 1:
        for num_iter in (50, 100, 200, 400):
            configs.append(f"num_factors=32 num_iter={num_iter}")
        for lr in (0.02, 0.1):
            configs.append(f"num_factors=32 num_iter=100 learn_rate={lr}")
        for reg in ("reg_u=0.01 reg_i=0.01 reg_j=0.001",
                    "reg_u=0.0005 reg_i=0.0005 reg_j=0.00005"):
            configs.append(f"num_factors=32 num_iter=100 {reg}")
        for f in (16, 64):
            configs.append(f"num_factors={f} num_iter=100")
        configs.append("num_factors=64 num_iter=200 learn_rate=0.1")
        configs.append("num_factors=32 num_iter=100 bias_reg=0.01")
    else:
        # phase 2: combos of the phase-1 winners (low lr, higher reg,
        # fewer factors)
        reg = "reg_u=0.01 reg_i=0.01 reg_j=0.001"
        configs += [
            f"num_factors=16 num_iter=100 learn_rate=0.02 {reg}",
            f"num_factors=16 num_iter=200 learn_rate=0.02 {reg}",
            f"num_factors=16 num_iter=100 {reg}",
            "num_factors=16 num_iter=200 learn_rate=0.02",
            f"num_factors=32 num_iter=200 learn_rate=0.02 {reg}",
            f"num_factors=16 num_iter=400 learn_rate=0.01 {reg}",
            "num_factors=16 num_iter=100 reg_u=0.04 reg_i=0.04 reg_j=0.004",
        ]

    if phase == 3:
        # convergence curves at the tuned config (BASELINE.md winner):
        # exact-XLA samplers vs the importance-weighted Pallas MXU epoch
        # (VERDICT r2 #7) — quantifies the sampling-semantics divergence
        # from BPRMF.cs:183-321 as a measured trade.
        opts = ("num_factors=16 learn_rate=0.02 "
                "reg_u=0.01 reg_i=0.01 reg_j=0.001")
        for env in ("0", "auto"):
            os.environ["MML_MXU"] = env
            m = create_item_recommender("BPRMF")
            configure(m, opts)
            m.feedback = train
            m.init_model()
            t0 = time.time()
            for it in range(1, 101):
                m.iterate()
                if it % 10 == 0:
                    res = evaluate_items(m, test, train)
                    path = ("mxu" if getattr(m, "_bpr_plan", None)
                            is not None else "xla")
                    print(f"BPRMF[{path}] it={it:3d} AUC {res['AUC']:.4f} "
                          f"prec@5 {res['prec@5']:.4f} MAP {res['MAP']:.4f} "
                          f"elapsed {time.time() - t0:6.1f}s", flush=True)
        return

    for opts in configs:
        m = create_item_recommender("BPRMF")
        configure(m, opts)
        m.feedback = train
        t0 = time.time()
        m.train()
        t_train = time.time() - t0
        res = evaluate_items(m, test, train)
        path = "mxu" if getattr(m, "_bpr_plan", None) is not None else "xla"
        print(f"BPRMF[{path}] {opts:55s} AUC {res['AUC']:.4f} "
              f"prec@5 {res['prec@5']:.4f} MAP {res['MAP']:.4f} "
              f"train {t_train:6.1f}s", flush=True)


if __name__ == "__main__":
    main()
