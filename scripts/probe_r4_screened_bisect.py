"""Round-4 bisect: where do the ~0.24 s between the LP-tail stage
(0.219 s min at 128 arbitrary lanes, production IPM config) and the
full screened step (0.508 s min) go at case300s?

Hypothesis: the cond-gated dense rescue (lp_ipm_batched restart_compact
sub-solve) + escalation passes fire on REAL miss lanes (~2-14 of 128
above the 5e-3 quality score per batch, results/case300_lpq.json) but
not on the arbitrary lanes the lp stage times, so the lp stage
under-counts the production LP tail.

Arms (full evaluate_states_screened on fresh 8192-batches, same
repair/hint/pf config as production):
  prod        IPMConfig()                       restarts auto=1, esc 2
  no_rescue   restarts=0, escalate=0, compact=0 single Schur pass only
  resc_only   escalate_passes=0                 rescue but no escalation

plus certify+repair alone (the tier-1 cost inside screened) for the
additive model. Fresh session-salted keys per rep (the relay caches
across sessions, see probe_case300_step.py).

Usage: python scripts/probe_r4_screened_bisect.py [--out results/r4_screened_bisect.json]
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

import powersystemsreliabilityassessment_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines import dcopf
from powersystemsreliabilityassessment_tpu.sampling.state import sample_states
from powersystemsreliabilityassessment_tpu.utils.config import (
    CompatFlags, IPMConfig)

_KEY_SALT = int(time.time()) % 1_000_000_007


def timed(fn, key0: int, reps: int = 5):
    walls = []
    for r in range(reps):
        key = jax.random.key(_KEY_SALT + key0 + r)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(key))
        walls.append(time.perf_counter() - t0)
    return {"min_s": round(min(walls), 4),
            "med_s": round(sorted(walls)[len(walls) // 2], 4)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--max-lp", type=int, default=128)
    ap.add_argument("--out", default="results/r4_screened_bisect.json")
    args = ap.parse_args()

    case = cases.case300s()
    sys_ = build_system(case)
    B = args.batch
    compat = CompatFlags()
    hint = dcopf.calibrate_shed_hint(sys_)
    hint_j = None if hint is None else jnp.asarray(hint, jnp.float32)
    rb = dcopf.default_repair_buffer(B, hinted=hint is not None)
    load = jnp.broadcast_to(sys_.load_pd[None, :], (B, sys_.n_load))

    def draw(key):
        return sample_states(key, sys_.unavail, sys_.always_up_nsq, B)

    def make_screened(ipm):
        @jax.jit
        def f(key):
            down = draw(key)
            res, n_over = dcopf.evaluate_states_screened(
                sys_, down, load, args.max_lp, compat, ipm,
                "proportional", repair_buffer=rb, woodbury_k=4,
                shed_hint=hint_j)
            return res.dns_mw, n_over
        return f

    arms = {
        "prod": IPMConfig(),
        "no_rescue": IPMConfig(restarts=0, escalate_passes=0,
                               restart_compact=0),
        "resc_only": IPMConfig(escalate_passes=0),
    }
    out = {"case": case.name, "batch": B, "max_lp": args.max_lp,
           "key_salt": _KEY_SALT, "backend": jax.default_backend(),
           "stages": {}}
    for i, (name, ipm) in enumerate(arms.items()):
        fn = make_screened(ipm)
        t0 = time.perf_counter()
        first = fn(jax.random.key(_KEY_SALT + 7000 + i))
        jax.block_until_ready(first)
        comp = time.perf_counter() - t0
        out["stages"][name] = timed(fn, 1000 * (i + 1))
        out["stages"][name]["compile_s"] = round(comp, 1)
        out["stages"][name]["n_overflow_warm"] = int(first[1])
        print(name, out["stages"][name], flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
