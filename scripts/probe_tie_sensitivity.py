"""RTS-96 tie-parameter sensitivity (VERDICT round-1 weak item 2/8).

The five inter-area tie lines in ``cases.rts96`` carry voltage-class-
typical impedance/rating estimates (the 1996 paper's exact tables are not
retrievable offline; endpoints ARE exact). This probe measures how much
the adequacy indices actually depend on those estimates: it sweeps tie
reactance and tie rating by +-50% (common random numbers — same seed and
sample path for every configuration, so index deltas are parameter
effects, not MC noise) and reports EDNS / LOLE / PLC per configuration.

Usage: python scripts/probe_tie_sensitivity.py [--samples 40960]
       [--out results/tie_sensitivity.json] [--cpu]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import powersystemsreliabilityassessment_tpu as psra  # noqa: F401

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.studies.hl2_nsq import (
    run_nsq_study)
from powersystemsreliabilityassessment_tpu.utils.config import MCSConfig

N_TIES = 5  # the last five branches of rts96 are the inter-area ties


def scaled_case(x_scale: float, rate_scale: float) -> cases.CaseData:
    c = cases.rts96()
    br_x = c.br_x.copy()
    br_rate = c.br_rate.copy()
    br_x[-N_TIES:] *= x_scale
    br_rate[-N_TIES:] *= rate_scale
    return dataclasses.replace(c, br_x=br_x, br_rate=br_rate)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=40960)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--out", default="results/tie_sensitivity.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    sweeps = [
        ("baseline", 1.0, 1.0),
        ("x*0.5", 0.5, 1.0),
        ("x*1.5", 1.5, 1.0),
        ("rate*0.5", 1.0, 0.5),
        ("rate*1.5", 1.0, 1.5),
        ("x*0.5,rate*1.5", 0.5, 1.5),
        ("x*1.5,rate*0.5", 1.5, 0.5),
    ]
    rows = []
    base = None
    for name, xs, rs in sweeps:
        t0 = time.time()
        res = run_nsq_study(
            scaled_case(xs, rs),
            MCSConfig(batch_size=args.batch, max_samples=args.samples,
                      beta_limit=0.0, seed=args.seed, antithetic=True))
        row = {"config": name, "x_scale": xs, "rate_scale": rs,
               "edns_mw": res.edns_mw, "lole_hr_yr": res.lole_hr_yr,
               "plc": res.plc, "beta": res.beta,
               "wall_s": round(time.time() - t0, 1)}
        if base is None:
            base = row
        row["edns_delta_pct"] = (100.0 * (row["edns_mw"] / base["edns_mw"]
                                          - 1.0)
                                 if base["edns_mw"] else 0.0)
        row["lole_delta_pct"] = (100.0 * (row["lole_hr_yr"]
                                          / base["lole_hr_yr"] - 1.0)
                                 if base["lole_hr_yr"] else 0.0)
        rows.append(row)
        print(f"{name:>16s}: EDNS {row['edns_mw']:8.4f} MW "
              f"({row['edns_delta_pct']:+6.2f}%) | LOLE "
              f"{row['lole_hr_yr']:8.3f} h/yr ({row['lole_delta_pct']:+6.2f}%)"
              f" | PLC {row['plc']:.5f} | beta {row['beta']:.4f} | "
              f"{row['wall_s']}s")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"samples": args.samples, "seed": args.seed,
                   "note": "common random numbers across configs",
                   "rows": rows}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
