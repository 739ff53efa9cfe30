"""Round-5: where does the case300s chronological (SEQ) step wall go,
and does the permanently-grown LP buffer tax every later batch?

Context: the 256-year case300s run (results/case300_seq_results.json)
averaged ~12 s per 2-year block (17,520 hour-states -> ~1.5k states/s)
after one 890-hour outage cluster grew the LP buffer 256 -> 1024/yr for
the REST of the run. If the step cost scales with the buffer, the
better policy is redo-with-a-big-step + return to the small step
(two compiled shapes) instead of permanent growth.

Arms (fixed Y=2 year-blocks, fresh session-salted keys per rep):
  lp256    max_lp 256/yr (512 total)  — the pre-growth shape
  lp1024   max_lp 1024/yr (2048 total) — the post-growth shape

Usage: python scripts/probe_seq300_step.py [--out results/seq300_step.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import powersystemsreliabilityassessment_tpu  # noqa: F401
import jax

from powersystemsreliabilityassessment_tpu.core import cases, load_profile
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.parallel import mesh as meshlib
from powersystemsreliabilityassessment_tpu.sampling import chronological
from powersystemsreliabilityassessment_tpu.studies.hl2_seq import (
    make_seq_batch_step)
from powersystemsreliabilityassessment_tpu.utils.config import (
    CompatFlags, IPMConfig)

_KEY_SALT = int(time.time()) % 1_000_000_007


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--arms", type=int, nargs="*", default=[256, 1024],
                    help="per-year LP buffer sizes to time")
    ap.add_argument("--out", default="results/seq300_step.json")
    args = ap.parse_args()

    case = cases.case300s()
    compat, ipm = CompatFlags(), IPMConfig()
    sys_ = build_system(case, compat)
    mesh = meshlib.scenario_mesh()
    meshlib.warmup_backend()
    hours = compat.hours_per_year_seq
    n_draws = chronological.default_num_draws(sys_.mttf, sys_.mttr, hours)
    factors = load_profile.load_factors(hours, compat.weekday_mode)
    Y = 2

    out = {"case": case.name, "years_per_device": Y, "hours": hours,
           "key_salt": _KEY_SALT, "backend": jax.default_backend(),
           "arms": {}}
    for lp in args.arms:
        name = f"lp{lp}"
        step = make_seq_batch_step(sys_, mesh, Y, compat, ipm, hours,
                                   n_draws, lp, factors, None,
                                   nodal_mode="proportional")
        t0 = time.perf_counter()
        first = step(jax.random.key(_KEY_SALT + 17))
        jax.block_until_ready(first)
        comp = time.perf_counter() - t0
        walls = []
        for r in range(args.reps):
            k = jax.random.key(_KEY_SALT + 1000 * (lp + 1) + r)
            t0 = time.perf_counter()
            jax.block_until_ready(step(k))
            walls.append(time.perf_counter() - t0)
        out["arms"][name] = {
            "min_s": round(min(walls), 3),
            "med_s": round(sorted(walls)[len(walls) // 2], 3),
            "compile_s": round(comp, 1),
            "overflow_first": int(first[8]),
            "hour_states_per_s_min": round(Y * hours / min(walls), 1),
        }
        print(name, out["arms"][name], flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
