"""Rare-event SEQ A/B: copper-sheet control variate vs plain MC.

RTS-24 with the whole load profile scaled by 0.8 (capacity-driven
deficits become rare: the regime where naive path importance sampling
degenerates — see NEXT.md — and multilevel splitting measured only
~1.45x). Both arms run 512 stationary-start years from the SAME seed
(common random numbers: identical component timelines), so the variance
ratio is a paired comparison of the estimators, not of the sample paths.

Per-year estimator variance is recovered from the reported CoV:
CoV = std_per_year / (mean * sqrt(N))  =>  var = (CoV * mean)^2 * N.
Efficiency = variance reduction x (wall_plain / wall_cv).

Writes results/cv_rare_event.json (cited by PARITY.md) and prints it.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.studies.hl2_seq import run_seq_study
from powersystemsreliabilityassessment_tpu.utils.config import MCSConfig

YEARS = 512
LOAD_SCALE = 0.8


def main() -> None:
    case = cases.rts24()
    cfg = MCSConfig(seed=7, max_years=YEARS, cov_threshold=0.0)  # run all years
    out = {"years_per_arm": YEARS, "load_scale": LOAD_SCALE, "seed": cfg.seed}

    for label, cv in (("plain", False), ("cv", True)):
        t0 = time.perf_counter()
        res = run_seq_study(case, cfg, sampling="stationary",
                            control_variate=cv, load_scale=LOAD_SCALE,
                            log_every=0)
        wall = time.perf_counter() - t0
        var = (res.cov * res.eens_mwh_yr) ** 2 * res.years
        out[label] = {"eens_mwh_yr": round(res.eens_mwh_yr, 3),
                      "cov": round(res.cov, 6),
                      "per_year_var": round(var, 1),
                      "years": res.years,
                      "wall_s": round(wall, 2)}

    out["variance_reduction"] = round(
        out["plain"]["per_year_var"] / out["cv"]["per_year_var"], 2)
    out["efficiency_equal_wall"] = round(
        out["variance_reduction"] * out["plain"]["wall_s"]
        / out["cv"]["wall_s"], 2)
    os.makedirs("results", exist_ok=True)
    with open("results/cv_rare_event.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
