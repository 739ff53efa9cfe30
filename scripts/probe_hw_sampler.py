"""Validate + time the hardware-PRNG sampler vs threefry on TPU.

Checks (a) distribution: per-component failure-rate z-scores over 1M
states, pinned components never fail, tiles decorrelated; (b) speed:
sample-only throughput both impls (bench discipline: fresh key per rep,
best + median over segments).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def measure(step, key, batch, seg_iters=8, n_segments=4):
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
    from powersystemsreliabilityassessment_tpu.ops import hw_sampler
    from powersystemsreliabilityassessment_tpu.sampling.state import (
        sample_states)
    from powersystemsreliabilityassessment_tpu.utils.config import CompatFlags

    sys_ = build_system(cases.rts24(), CompatFlags())
    batch = 262144
    key = jax.random.key(0)
    out = {"selfcheck": hw_sampler._selfcheck()}
    print("selfcheck", out["selfcheck"], flush=True)

    for name, impl in [("threefry", "threefry"), ("hw", "hw")]:
        @jax.jit
        def step(k, impl=impl):
            d = sample_states(k, sys_.unavail, sys_.always_up_nsq, batch,
                              rng_impl=impl)
            return jnp.sum(d)
        best, med = measure(step, key, batch)
        out[name] = {"best_ms": round(1e3 * batch / best, 3),
                     "median_ms": round(1e3 * batch / med, 3)}
        print(name, out[name], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
