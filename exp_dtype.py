"""bf16-vs-f32 MXU operand quality probe (VERDICT r3 #6).

The Pallas epochs default to mxu_dtype='bf16' (gathered factor rows and
scattered deltas round through bf16 with f32 accumulation; tables stay
f32). This measures the quality cost of that default at the standard
benchmark shapes: BiasedMF RMSE on the ML-1M-shaped rating benchmark
and BPRMF AUC/prec@5 on the implicit benchmark — same seeds, only the
operand dtype differs. Results recorded in BASELINE.md.

Usage: python exp_dtype.py [--small]
"""

import sys
import time

import numpy as np


def main():
    small = "--small" in sys.argv
    scale = 0.05 if small else 1.0
    from mymedialite_tpu.data.synthetic import (
        split_posonly, split_ratings, synthetic_posonly, synthetic_ratings,
    )
    from mymedialite_tpu.eval import evaluate_items, evaluate_ratings
    from mymedialite_tpu.models.bpr import BPRMF
    from mymedialite_tpu.models.mf import BiasedMatrixFactorization

    data = synthetic_ratings(num_users=int(6040 * scale) or 60,
                             num_items=int(3706 * scale) or 40,
                             num_ratings=int(1_000_000 * scale) or 5000,
                             seed=100)
    train, test = split_ratings(data, 0.1, seed=101)
    for dt in ("bf16", "f32"):
        m = BiasedMatrixFactorization()
        m.num_factors = 40
        m.num_iter = 40
        m.bold_driver = True
        m.mxu_dtype = dt
        m.ratings = train
        t0 = time.time()
        m.train()
        res = evaluate_ratings(m, test)
        mode = m._mxu_mode() or "xla"
        print(f"BiasedMF mxu_dtype={dt} [{mode}]: {res} "
              f"(train {time.time()-t0:.1f}s)", flush=True)

    pos = synthetic_posonly(num_users=int(6040 * scale) or 60,
                            num_items=int(3706 * scale) or 40,
                            num_events=int(500_000 * scale) or 4000,
                            seed=102)
    ptrain, ptest = split_posonly(pos, 0.2, seed=103)
    for dt in ("bf16", "f32"):
        b = BPRMF()
        b.num_factors = 16
        b.num_iter = 100
        b.learn_rate = 0.02
        b.reg_u = b.reg_i = 0.01
        b.reg_j = 0.001
        b.mxu_dtype = dt
        b.feedback = ptrain
        t0 = time.time()
        b.train()
        res = evaluate_items(b, ptest, ptrain)
        mode = b._mxu_mode() or "xla"
        print(f"BPRMF mxu_dtype={dt} [{mode}]: {res} "
              f"(train {time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
