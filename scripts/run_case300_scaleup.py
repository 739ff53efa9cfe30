"""case300-scale NSQ end-to-end run (RESULTS.md "case300-scale NSQ").

Reproduces the committed artifact `results/case300_scaleup.json`: full
NSQ study on the synthetic 300-bus system (``cases.case300s``, m = 792 —
past every Pallas crossover, so the LP lanes run the XLA batched-Cholesky
fallback with the refinement+restart rescue). 16,384 samples, batch
1024, max_lp 384, antithetic, seed 3 (pass --seed to vary).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import powersystemsreliabilityassessment_tpu as psra  # noqa: F401


def main() -> None:
    import argparse

    from powersystemsreliabilityassessment_tpu.core import cases
    from powersystemsreliabilityassessment_tpu.studies.hl2_nsq import (
        run_nsq_study)
    from powersystemsreliabilityassessment_tpu.utils.config import MCSConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--samples", type=int, default=16384)
    ap.add_argument("--out", default="results/case300_scaleup.json")
    args = ap.parse_args()

    case = cases.case300s()
    t0 = time.perf_counter()
    res = run_nsq_study(
        case,
        MCSConfig(batch_size=1024, max_samples=args.samples, beta_limit=0.0,
                  seed=args.seed, antithetic=True),
        max_lp=384)
    wall = time.perf_counter() - t0
    out = {"case": case.name, "n_bus": case.n_bus, "n_comp": case.n_comp,
           "m": case.n_bus + case.n_branch,
           "samples": res.samples, "seed": args.seed,
           "edns_mw": round(res.edns_mw, 5),
           "lole_hr_yr": round(res.lole_hr_yr, 3),
           "beta": round(res.beta, 5),
           "overflow_states": res.overflow_states,
           "wall_s_incl_compile": round(wall, 1),
           "samples_per_s_incl_compile": round(res.samples / wall, 1)}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
