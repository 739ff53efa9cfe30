"""Is certify_states compute-bound (MXU passes) or bandwidth-bound?

The package forces jax_default_matmul_precision="highest" (6 bf16 MXU
passes per f32 matmul) for exactness. This probe times the bench-path
certificate (repair_buffer compaction, B=262144) under HIGHEST / HIGH
(3-pass, ~2^-19 relative error) / DEFAULT (1-pass bf16, ~2^-8), plus the
full bench step with the hw sampler, to locate the certificate's roof.

If HIGH==HIGHEST within noise, the certificate is bandwidth-bound and
precision is free — keep HIGHEST. Any speed win would still need the
exhaustive N-0/1/2 parity rerun before touching production.
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

    def make_cert(rng_impl):
        @jax.jit
        def s(k):
            down = sample_states(k, sys_.unavail, sys_.always_up_nsq, batch,
                                 rng_impl=rng_impl)
            load = jnp.broadcast_to(sys_.load_pd[None, :],
                                    (batch, sys_.n_load))
            cert = dcopf.certify_states(
                sys_, down, load,
                repair_buffer=dcopf.default_repair_buffer(batch))
            return (jnp.sum(cert.deficit), jnp.sum(cert.certified),
                    jnp.sum(cert.shed))
        return s

    for name, prec in [("cert_highest", "highest"), ("cert_high", "high"),
                       ("cert_default", "default")]:
        with jax.default_matmul_precision(prec):
            s = make_cert("threefry")
            best, med = measure(s, key, batch)
        out[name] = {"best_ms": round(1e3 * batch / best, 2),
                     "median_ms": round(1e3 * batch / med, 2)}
        print(name, out[name], flush=True)

    # Full bench step, hw sampler, production precision.
    @jax.jit
    def full_hw(k):
        down = sample_states(k, sys_.unavail, sys_.always_up_nsq, batch,
                             rng_impl="hw")
        load = jnp.broadcast_to(sys_.load_pd[None, :], (batch, sys_.n_load))
        res, n_over = dcopf.evaluate_states_screened(
            sys_, down, load, 256, compat, ipm, "proportional",
            repair_buffer=dcopf.default_repair_buffer(batch))
        return jnp.sum(res.dns_mw), jnp.sum(res.failure), n_over

    best, med = measure(full_hw, key, batch)
    out["full_hw"] = {"best_scen_per_s": round(best, 0),
                      "median_scen_per_s": round(med, 0),
                      "best_ms": round(1e3 * batch / best, 2)}
    print("full_hw", out["full_hw"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
