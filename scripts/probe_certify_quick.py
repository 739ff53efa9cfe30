"""Measure the quick (repair_iters=0) certificate pass vs the full one.

Reports, at NSQ peak load B=262144:
  * time of certify_states with repair_iters=0 vs 3;
  * lane counts: quick-certified, full-certified, repair-worthy
    (intact-topology lanes the quick pass fails — the only lanes the
    repair descent can rescue), and how many repair actually rescues —
    this sizes the stage-2 compaction buffer for the two-stage screen.
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
    from powersystemsreliabilityassessment_tpu.utils.config import CompatFlags

    compat = CompatFlags()
    sys_ = build_system(cases.rts24(), compat)
    batch = 262144
    key = jax.random.key(0)
    out = {}

    def mk(iters):
        @jax.jit
        def f(k):
            down = sample_states(k, sys_.unavail, sys_.always_up_nsq, batch)
            load = jnp.broadcast_to(sys_.load_pd[None, :],
                                    (batch, sys_.n_load))
            cert = dcopf.certify_states(sys_, down, load,
                                        repair_iters=iters)
            return (jnp.sum(cert.deficit), jnp.sum(cert.certified),
                    jnp.sum(cert.shed))
        return f

    for iters in (0, 1, 3):
        best, med = measure(mk(iters), key, batch)
        out[f"certify_iters_{iters}"] = {
            "best_ms": round(1e3 * batch / best, 2),
            "median_ms": round(1e3 * batch / med, 2)}
        print(iters, out[f"certify_iters_{iters}"], flush=True)

    @jax.jit
    def counts(k):
        down = sample_states(k, sys_.unavail, sys_.always_up_nsq, batch)
        load = jnp.broadcast_to(sys_.load_pd[None, :], (batch, sys_.n_load))
        quick = dcopf.certify_states(sys_, down, load, repair_iters=0)
        full = dcopf.certify_states(sys_, down, load, repair_iters=3)
        no_line_out = ~jnp.any(down[:, sys_.n_gen:], axis=1)
        worthy = no_line_out & ~quick.certified
        rescued = worthy & full.certified
        return (jnp.sum(quick.certified), jnp.sum(full.certified),
                jnp.sum(worthy), jnp.sum(rescued))

    cs = []
    for i in range(16):
        cs.append([int(x) for x in counts(jax.random.fold_in(key, 1000 + i))])
    import numpy as np
    cs = np.array(cs)
    out["counts_B262144"] = {
        "quick_certified_mean": float(cs[:, 0].mean()),
        "full_certified_mean": float(cs[:, 1].mean()),
        "repair_worthy_mean": float(cs[:, 2].mean()),
        "repair_worthy_max": int(cs[:, 2].max()),
        "rescued_mean": float(cs[:, 3].mean()),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
