"""A/B the fused Pallas certificate kernel vs the jnp certify_states.

Measures (bench.py discipline: fresh key per rep, best + median over
segments) and verifies agreement on hardware at production batch size.
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
    from powersystemsreliabilityassessment_tpu.engines import dcopf
    from powersystemsreliabilityassessment_tpu.ops import certify_kernel
    from powersystemsreliabilityassessment_tpu.sampling.state import (
        sample_states)
    from powersystemsreliabilityassessment_tpu.utils.config import CompatFlags

    sys_ = build_system(cases.rts24(), CompatFlags())
    batch = 262144
    key = jax.random.key(0)

    def mk(certify):
        @jax.jit
        def step(k):
            down = sample_states(k, sys_.unavail, sys_.always_up_nsq, batch)
            load = jnp.broadcast_to(sys_.load_pd[None, :],
                                    (batch, sys_.n_load))
            cert = certify(sys_, down, load)
            return (jnp.sum(cert.deficit), jnp.sum(cert.certified),
                    jnp.sum(cert.shed), jnp.sum(cert.dispatch))
        return step

    out = {}
    for name, certify in [("jnp", dcopf.certify_states),
                          ("fused", certify_kernel.certify_states_fused)]:
        t0 = time.perf_counter()
        step = mk(certify)
        best, med = measure(step, key, batch)
        out[name] = {"compile_s": round(time.perf_counter() - t0, 1),
                     "best_scen_per_s": round(best, 0),
                     "median_scen_per_s": round(med, 0),
                     "best_ms_per_batch": round(1e3 * batch / best, 2),
                     "median_ms_per_batch": round(1e3 * batch / med, 2)}
        print(name, out[name], flush=True)

    # Hardware agreement on one batch.
    down = sample_states(jax.random.fold_in(key, 999), sys_.unavail,
                         sys_.always_up_nsq, batch)
    load = jnp.broadcast_to(sys_.load_pd[None, :], (batch, sys_.n_load))
    a = jax.jit(dcopf.certify_states)(sys_, down, load)
    b = jax.jit(certify_kernel.certify_states_fused)(sys_, down, load)
    ca, cb = np.asarray(a.certified), np.asarray(b.certified)
    both = ca & cb
    out["agreement"] = {
        "certified_jnp": int(ca.sum()), "certified_fused": int(cb.sum()),
        "agree_frac": float((ca == cb).mean()),
        "deficit_maxdiff": float(np.abs(np.asarray(a.deficit)
                                        - np.asarray(b.deficit)).max()),
        "shed_maxdiff_both": float(np.abs(np.asarray(a.shed)
                                          - np.asarray(b.shed))[both].max()),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
