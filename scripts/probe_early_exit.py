"""Measure IPMConfig.early_exit on real TPU (fused-kernel whole-block
early exit + difficulty-ordered LP-lane compaction).

End-to-end ``evaluate_states_screened`` in "lp" nodal mode (the default
study configuration), early_exit off vs on. CAUTION (CLAUDE.md): scan
around evaluate_states_screened SIGILLs the remote compiler, so the
relay's per-dispatch noise cannot be slope-amortized here — instead the
batch is made big enough (B=262144, ~0.3 s of work) that the +-40 ms
dispatch noise is <15%, and the minimum over reps is reported.

Prints one JSON line; paste the numbers into NEXT.md / RESULTS.md and
flip the IPMConfig.early_exit default if it wins.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def min_time(fn, reps=8):
    """Min seconds per call over reps; fresh key per rep (relay caches
    repeated inputs)."""
    jax.block_until_ready(fn(jax.random.key(999)))  # compile + warm
    best = np.inf
    for rep in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(jax.random.key(rep)))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from powersystemsreliabilityassessment_tpu.core import cases
    from powersystemsreliabilityassessment_tpu.core.system import build_system
    from powersystemsreliabilityassessment_tpu.engines import dcopf
    from powersystemsreliabilityassessment_tpu.sampling.state import (
        sample_states)
    from powersystemsreliabilityassessment_tpu.utils.config import (
        CompatFlags, IPMConfig)

    compat = CompatFlags()
    case = cases.rts24()
    sys = build_system(case, compat)
    out = {}

    B = 262144
    max_lp = 32768  # "lp" mode needs ~10% of peak states
    for label, ipm in (("off", IPMConfig()),
                       ("on", IPMConfig(early_exit=True))):
        @jax.jit
        def step(key, ipm=ipm):
            down = sample_states(key, sys.unavail, sys.always_up_nsq, B)
            load = jnp.broadcast_to(sys.load_pd[None, :],
                                    (B, sys.n_load))
            res, n_over = dcopf.evaluate_states_screened(
                sys, down, load, max_lp, compat, ipm, "lp")
            return (jnp.sum(res.dns_mw), jnp.sum(res.failure),
                    n_over.astype(jnp.float32))

        sec = min_time(step)
        out[f"lp_mode_{label}_s"] = round(sec, 5)
        out[f"lp_mode_{label}_scen_per_s"] = round(B / sec, 1)

    # Same-seed estimator invariance (order + early exit must not move
    # the indices): one batch, both configs.
    key = jax.random.key(1234)
    vals = {}
    for label, ipm in (("off", IPMConfig()),
                       ("on", IPMConfig(early_exit=True))):
        @jax.jit
        def one(key, ipm=ipm):
            down = sample_states(key, sys.unavail, sys.always_up_nsq, B)
            load = jnp.broadcast_to(sys.load_pd[None, :],
                                    (B, sys.n_load))
            res, _ = dcopf.evaluate_states_screened(
                sys, down, load, max_lp, compat, ipm, "lp")
            return jnp.sum(res.dns_mw), jnp.sum(res.failure)
        dns, flags = one(key)
        vals[label] = (float(dns), float(flags))
    out["same_seed_dns_off"] = round(vals["off"][0], 4)
    out["same_seed_dns_on"] = round(vals["on"][0], 4)
    out["same_seed_flags_equal"] = vals["off"][1] == vals["on"][1]

    out["speedup"] = round(out["lp_mode_off_s"] / out["lp_mode_on_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
