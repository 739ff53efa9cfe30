"""A/B the headline-bench LP-buffer size (and a sampling-only floor).

The bench step compacts LP-needy lanes into a fixed max_lp buffer and the
fused IPM solves ALL buffer lanes (padding included), so buffer size is
pure overhead above the actual need (~0.6% of B = ~1600 at B=262144,
sd ~40 — binomial, so 2048 still leaves ~12 sigma of headroom; overflow
would only degrade throughput via the study-level redo, never the
estimate). Measures scenarios/s for max_lp in {4096, 2048} plus a
sampler+certificates-only variant (max_lp=0 path is not supported;
certificate floor approximated by nodal_mode="proportional" with the
smallest legal buffer) to locate the ceiling.

Same measurement discipline as bench.py: fresh keys per rep, best and
median segment over several segments.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def measure(step, key, batch, seg_iters=5, n_segments=4):
    jax.block_until_ready(step(key))
    rates, it = [], 0
    for _ in range(n_segments):
        t0 = time.perf_counter()
        out = None
        for _ in range(seg_iters):
            out = step(jax.random.fold_in(key, it))
            it += 1
        jax.block_until_ready(out)
        rates.append(batch * seg_iters / (time.perf_counter() - t0))
    return max(rates), sorted(rates)[len(rates) // 2]


def main() -> None:
    from powersystemsreliabilityassessment_tpu.core import cases
    from powersystemsreliabilityassessment_tpu.core.system import build_system
    from powersystemsreliabilityassessment_tpu.engines import dcopf
    from powersystemsreliabilityassessment_tpu.sampling.state import (
        sample_states)
    from powersystemsreliabilityassessment_tpu.utils.config import (
        CompatFlags, IPMConfig)

    compat, ipm = CompatFlags(), IPMConfig()
    sys_ = build_system(cases.rts24(), compat)
    batch = 262144
    key = jax.random.key(0)
    out = {}

    for max_lp in (4096, 2048, 1024, 128):
        @jax.jit
        def step(k, max_lp=max_lp):
            down = sample_states(k, sys_.unavail, sys_.always_up_nsq, batch)
            load = jnp.broadcast_to(sys_.load_pd[None, :],
                                    (batch, sys_.n_load))
            res, n_over = dcopf.evaluate_states_screened(
                sys_, down, load, max_lp, compat, ipm, "proportional")
            return jnp.sum(res.dns_mw), jnp.sum(res.failure), n_over
        best, med = measure(step, key, batch)
        dns, flags, n_over = map(float, step(jax.random.key(77)))
        out[f"maxlp_{max_lp}"] = {
            "best_scen_per_s": round(best, 0), "median_scen_per_s":
            round(med, 0), "overflow_states": int(n_over),
            "seed77_dns": round(dns, 2)}

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
