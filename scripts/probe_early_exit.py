"""Measure IPMConfig.early_exit on real TPU (fused-kernel whole-block
early exit + difficulty-ordered LP-lane compaction).

Two measurements, both slope-timed per CLAUDE.md (k solves inside ONE
dispatch via lax.scan; (k9-k1)/8 removes the relay's per-dispatch noise):

1. raw fused kernel on an NSQ-realistic LP-lane mix (the lanes an
   actual peak-load screen compacts), early_exit off vs on;
2. end-to-end evaluate_states_screened in "lp" nodal mode (the default
   study configuration), off vs on.

Prints one JSON line; paste the numbers into NEXT.md / RESULTS.md and
flip the IPMConfig.early_exit default if both are wins.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(fn, k_lo=1, k_hi=9):
    """Seconds per call via lax.scan slope; fn must be key -> pytree."""
    def runner(k):
        @jax.jit
        def run(key):
            def body(c, i):
                out = fn(jax.random.fold_in(key, i))
                s = sum(jnp.sum(x) for x in jax.tree.leaves(out))
                return c + s, ()
            tot, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
            return tot
        return run

    fs = {k: runner(k) for k in (k_lo, k_hi)}
    for k, f in fs.items():
        float(f(jax.random.key(999 + k)))  # compile + warm
    best = np.inf
    for rep in range(5):
        ts = {}
        for k, f in fs.items():
            t0 = time.perf_counter()
            float(f(jax.random.key(rep * 7 + k)))
            ts[k] = time.perf_counter() - t0
        best = min(best, (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo))
    return best


def main() -> None:
    import dataclasses

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

    B = 65536
    max_lp = 8192  # "lp" mode needs ~10% of peak states
    for label, ipm in (("off", IPMConfig()),
                       ("on", IPMConfig(early_exit=True))):
        def step(key, ipm=ipm):
            down = sample_states(key, sys.unavail, sys.always_up_nsq, B)
            load = jnp.broadcast_to(sys.load_pd[None, :],
                                    (B, sys.n_load))
            res, n_over = dcopf.evaluate_states_screened(
                sys, down, load, max_lp, compat, ipm, "lp")
            return (jnp.sum(res.dns_mw), jnp.sum(res.failure),
                    n_over.astype(jnp.float32))

        sec = slope_time(step)
        out[f"lp_mode_{label}_s"] = round(sec, 5)
        out[f"lp_mode_{label}_scen_per_s"] = round(B / sec, 1)

    # Same-seed estimator invariance (order + early exit must not move
    # the indices): one batch, both configs.
    key = jax.random.key(1234)
    vals = {}
    for label, ipm in (("off", IPMConfig()),
                       ("on", IPMConfig(early_exit=True))):
        down = sample_states(key, sys.unavail, sys.always_up_nsq, B)
        load = jnp.broadcast_to(sys.load_pd[None, :], (B, sys.n_load))
        res, _ = dcopf.evaluate_states_screened(
            sys, down, load, max_lp, compat, ipm, "lp")
        vals[label] = (float(jnp.sum(res.dns_mw)),
                       float(jnp.sum(res.failure)))
    out["same_seed_dns_off"] = round(vals["off"][0], 4)
    out["same_seed_dns_on"] = round(vals["on"][0], 4)
    out["same_seed_flags_equal"] = vals["off"][1] == vals["on"][1]

    out["speedup"] = round(out["lp_mode_off_s"] / out["lp_mode_on_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
