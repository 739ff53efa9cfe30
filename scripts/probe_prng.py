"""A/B the state-sampler PRNG at the bench shape: threefry vs rbg.

The tier-1 breakdown showed sample_states alone costs ~4.6 ms at
B=262144 (13% of the bench step). JAX's default threefry2x32 is
software-evaluated on TPU; the 'rbg' implementation lowers to the XLA
RngBitGenerator (hardware-assisted Philox) and is typically much
cheaper. Both are counter-based, keyed and fold_in-able, so the
deterministic / order-independent sampling contract is identical —
only the stream differs.
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
    from powersystemsreliabilityassessment_tpu.sampling.state import (
        sample_states)
    from powersystemsreliabilityassessment_tpu.utils.config import CompatFlags

    sys_ = build_system(cases.rts24(), CompatFlags())
    batch = 262144
    out = {}

    @jax.jit
    def samp(k):
        down = sample_states(k, sys_.unavail, sys_.always_up_nsq, batch)
        return jnp.sum(down)

    for name, key in [("threefry", jax.random.key(0)),
                      ("rbg", jax.random.key(0, impl="rbg"))]:
        best, med = measure(samp, key, batch)
        out[name] = {"best_ms": round(1e3 * batch / best, 3),
                     "median_ms": round(1e3 * batch / med, 3)}
        print(name, out[name], flush=True)

    # Distribution sanity for rbg: per-component failure frequencies match
    # unavailability within 5 sigma over 32 batches.
    import numpy as np
    k = jax.random.key(123, impl="rbg")
    tot = np.zeros(sys_.unavail.shape[0])
    nrep = 32
    for i in range(nrep):
        tot += np.asarray(jnp.sum(sample_states(
            jax.random.fold_in(k, i), sys_.unavail, sys_.always_up_nsq,
            batch), axis=0))
    n = nrep * batch
    p = np.asarray(sys_.unavail) * (1 - np.asarray(sys_.always_up_nsq))
    sd = np.sqrt(np.maximum(p * (1 - p) * n, 1e-12))
    z = (tot - p * n) / np.maximum(sd, 1e-12)
    out["rbg_freq_max_abs_z"] = round(float(np.abs(z).max()), 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
