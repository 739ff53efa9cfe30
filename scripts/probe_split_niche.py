"""Prove (or demote) multilevel splitting's claimed niche (round-3
VERDICT item 6): a transmission-driven tail the copper-margin control
variate cannot see.

Config: RTS-96 with the five inter-area tie ratings halved — the one
knob the CRN sensitivity sweep showed matters (+16% EDNS,
results/tie_sensitivity.json). Under weak ties, area-local capacity
dips produce curtailment while the SYSTEM copper margin stays
positive: the copper CV's correlation collapses, and splitting's
margin-triggered cloning multiplies effort exactly in those windows.

Arms (all SEQ, same case, fixed year budgets — no early stop):
  plain      reference sampler
  cv         copper-sheet control variate (stationary sampler)
  split      multilevel splitting / RESTART (auto level, k=4)

Metric: work-normalized efficiency 1 / (cov^2 * wall_s) — equal-wall
comparison without needing equal walls; the arm with the highest
efficiency estimates EENS fastest. Honest accounting: EENS point
estimates, CoV, years and wall per arm all land in the artifact.

Usage: python scripts/probe_split_niche.py [--years 768] [--out ...]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import powersystemsreliabilityassessment_tpu as psra  # noqa: F401

N_TIES = 5  # the last five branches of rts96 are the inter-area ties


def weak_tie_case(rate_scale: float = 0.5):
    from powersystemsreliabilityassessment_tpu.core import cases
    c = cases.rts96()
    br_rate = c.br_rate.copy()
    br_rate[-N_TIES:] *= rate_scale
    return dataclasses.replace(c, br_rate=br_rate)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--years", type=int, default=768)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--rate-scale", type=float, default=0.5)
    ap.add_argument("--out", default="results/split_niche.json")
    args = ap.parse_args()

    from powersystemsreliabilityassessment_tpu.studies.hl2_seq import (
        run_seq_study)
    from powersystemsreliabilityassessment_tpu.studies.hl2_seq_split import (
        SplitConfig, run_seq_split_study)
    from powersystemsreliabilityassessment_tpu.utils.config import MCSConfig

    case = weak_tie_case(args.rate_scale)
    cfg = MCSConfig(max_years=args.years, cov_threshold=0.0,
                    seed=args.seed)
    out = {"case": f"rts96 tie rating x{args.rate_scale}",
           "years": args.years, "seed": args.seed, "runs": {}}

    def record(name, res, wall):
        cov = float(res.cov)
        out["runs"][name] = {
            "eens_mwh_yr": round(res.eens_mwh_yr, 2),
            "lole_hr_yr": round(res.lole_hr_yr, 4),
            "cov": round(cov, 5),
            "years": int(res.years),
            "wall_s": round(wall, 1),
            "efficiency": round(1.0 / max(cov * cov * wall, 1e-12), 2),
        }
        print(name, json.dumps(out["runs"][name]), flush=True)

    t0 = time.perf_counter()
    res = run_seq_study(case, cfg, log_every=0)
    record("plain", res, time.perf_counter() - t0)

    t0 = time.perf_counter()
    res = run_seq_study(case, cfg, log_every=0, control_variate=True)
    record("cv", res, time.perf_counter() - t0)

    t0 = time.perf_counter()
    res = run_seq_split_study(case, cfg, SplitConfig(k_clones=4),
                              log_every=0)
    record("split", res, time.perf_counter() - t0)

    e = out["runs"]
    out["split_beats_plain"] = e["split"]["efficiency"] > e["plain"]["efficiency"]
    out["split_beats_cv"] = e["split"]["efficiency"] > e["cv"]["efficiency"]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}))


if __name__ == "__main__":
    main()
