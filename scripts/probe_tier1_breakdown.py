"""Decompose the bench step's non-LP time: sampler, certificates, compaction.

The headline bench (B=262144, max_lp=2048, proportional mode) runs ~7.0M
scen/s; with the smallest legal buffer the ceiling is ~9.4M — so the
sampler + tier-1 certificates + compaction cost ~28 ms/batch while the
fused LP adds ~10 ms. This probe times progressively larger prefixes of
that pipeline to find where the 28 ms goes:

  1 sample            : sample_states only
  2 +copper           : + copper-sheet deficit (certify's first matmuls)
  3 +certify          : + full certify_states (repair loop, LODF, N-2)
  4 +compact          : + need_lp/top_k/gathers (no LP call: returns the
                         gathered sub-batch sums instead)
  5 full              : the bench step (max_lp=2048, with the fused LP)

Same discipline as bench.py: fresh key per rep, multiple segments, report
best+median. Each variant reduces to scalars so fetch cost is identical.
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
    from powersystemsreliabilityassessment_tpu.sampling.state import (
        sample_states)
    from powersystemsreliabilityassessment_tpu.utils.config import (
        CompatFlags, IPMConfig)

    compat, ipm = CompatFlags(), IPMConfig()
    sys_ = build_system(cases.rts24(), compat)
    batch = 262144
    max_lp = 2048
    key = jax.random.key(0)
    out = {}

    @jax.jit
    def s1(k):
        down = sample_states(k, sys_.unavail, sys_.always_up_nsq, batch)
        return jnp.sum(down)

    @jax.jit
    def s2(k):
        down = sample_states(k, sys_.unavail, sys_.always_up_nsq, batch)
        dt = sys_.bus_pd.dtype
        gen_up = 1.0 - down[:, : sys_.n_gen].astype(dt)
        cap = gen_up @ sys_.gen_pmax
        load = jnp.broadcast_to(sys_.load_pd[None, :], (batch, sys_.n_load))
        deficit = jnp.maximum(jnp.sum(load, axis=1) - cap, 0.0)
        return jnp.sum(deficit), jnp.sum(down)

    @jax.jit
    def s3(k):
        down = sample_states(k, sys_.unavail, sys_.always_up_nsq, batch)
        load = jnp.broadcast_to(sys_.load_pd[None, :], (batch, sys_.n_load))
        cert = dcopf.certify_states(sys_, down, load)
        return (jnp.sum(cert.deficit), jnp.sum(cert.certified),
                jnp.sum(cert.shed))

    @jax.jit
    def s4(k):
        down = sample_states(k, sys_.unavail, sys_.always_up_nsq, batch)
        load = jnp.broadcast_to(sys_.load_pd[None, :], (batch, sys_.n_load))
        pre = dcopf.certify_states(sys_, down, load)
        need_lp = ~pre.certified
        B_pad = need_lp.shape[0]
        score = need_lp.astype(jnp.int32) * (2 * B_pad) - np.arange(
            B_pad, dtype=np.int32)
        _, idx = jax.lax.top_k(score, max_lp)
        valid = (np.arange(max_lp, dtype=np.int32) < jnp.sum(need_lp)) \
            & need_lp[idx]
        # gather the sub-batch inputs (what the LP would consume) and the
        # scatter-back of a placeholder result
        sub_down = down[idx]
        dns = pre.deficit * sys_.base_mva
        dns = dns.at[idx].set(jnp.where(valid, 0.5, dns[idx]))
        return jnp.sum(dns), jnp.sum(sub_down), jnp.sum(valid)

    @jax.jit
    def s5(k):
        down = sample_states(k, sys_.unavail, sys_.always_up_nsq, batch)
        load = jnp.broadcast_to(sys_.load_pd[None, :], (batch, sys_.n_load))
        res, n_over = dcopf.evaluate_states_screened(
            sys_, down, load, max_lp, compat, ipm, "proportional")
        return jnp.sum(res.dns_mw), jnp.sum(res.failure), n_over

    for name, fn in [("1_sample", s1), ("2_copper", s2), ("3_certify", s3),
                     ("4_compact", s4), ("5_full", s5)]:
        best, med = measure(fn, key, batch)
        out[name] = {
            "best_scen_per_s": round(best, 0),
            "median_scen_per_s": round(med, 0),
            "best_ms_per_batch": round(1e3 * batch / best, 2),
            "median_ms_per_batch": round(1e3 * batch / med, 2),
        }
        print(name, out[name], flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
