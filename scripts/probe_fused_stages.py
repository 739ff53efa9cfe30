"""Locate where the fused-tier1 step's time goes (round 3).

A/B showed fused = 52 ms/batch vs default = 16 ms at B=262144 even
though hardware parity is exact. Time progressively larger prefixes,
each reduced to scalars so relay fetch cost is constant:

  k        : sample_certify_quick only
  k+fin    : + certify_finish (finish_buffer = batch//8)
  k+fin+lp : the full fused step (evaluate_states_screened(pre=...))
  jnp      : sample_states + certify_states (default tier 1, no LP)
  jnp+lp   : the full default step

Same discipline as bench.py: fresh key each rep, segments, best+median.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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
    med = float(np.median(rates))
    return {"ms_per_batch": round(batch / med * 1e3, 2),
            "scen_per_s": round(med, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=262144)
    args = ap.parse_args()
    batch = args.batch

    from powersystemsreliabilityassessment_tpu.core import cases
    from powersystemsreliabilityassessment_tpu.core.system import build_system
    from powersystemsreliabilityassessment_tpu.engines import dcopf
    from powersystemsreliabilityassessment_tpu.ops import (
        fused_sampler_cert as fsc)
    from powersystemsreliabilityassessment_tpu.sampling.state import (
        sample_states)
    from powersystemsreliabilityassessment_tpu.utils.config import (
        CompatFlags, IPMConfig)

    compat, ipm = CompatFlags(), IPMConfig()
    sys_ = build_system(cases.rts24(), CompatFlags())
    max_lp = 256
    fbuf = dcopf.default_finish_buffer(batch)
    rbuf = dcopf.default_repair_buffer(batch)

    @jax.jit
    def k_only(key):
        down, ok1, deficit, shed = fsc.sample_certify_quick(key, sys_, batch)
        return (jnp.sum(down), jnp.sum(ok1), jnp.sum(deficit),
                jnp.sum(shed))

    @jax.jit
    def k_fin(key):
        down, ok1, deficit, shed = fsc.sample_certify_quick(key, sys_, batch)
        load = jnp.broadcast_to(sys_.load_pd[None, :],
                                (batch, sys_.n_load))
        pre = dcopf.certify_finish(sys_, down, load, deficit, shed, ok1,
                                   fbuf, woodbury_k=2)
        return (jnp.sum(pre.certified), jnp.sum(pre.deficit),
                jnp.sum(pre.shed))

    @jax.jit
    def k_fin_lp(key):
        down, ok1, deficit, shed = fsc.sample_certify_quick(key, sys_, batch)
        load = jnp.broadcast_to(sys_.load_pd[None, :],
                                (batch, sys_.n_load))
        pre = dcopf.certify_finish(sys_, down, load, deficit, shed, ok1,
                                   fbuf, woodbury_k=2)
        res, n_over = dcopf.evaluate_states_screened(
            sys_, down, load, max_lp, compat, ipm, "proportional", pre=pre)
        return (jnp.sum(res.dns_mw), n_over)

    @jax.jit
    def jnp_t1(key):
        down = sample_states(key, sys_.unavail, sys_.always_up_nsq, batch)
        load = jnp.broadcast_to(sys_.load_pd[None, :],
                                (batch, sys_.n_load))
        cert = dcopf.certify_states(sys_, down, load, repair_buffer=rbuf,
                                    woodbury_k=2)
        return (jnp.sum(cert.certified), jnp.sum(cert.deficit),
                jnp.sum(cert.shed))

    @jax.jit
    def jnp_full(key):
        down = sample_states(key, sys_.unavail, sys_.always_up_nsq, batch)
        load = jnp.broadcast_to(sys_.load_pd[None, :],
                                (batch, sys_.n_load))
        res, n_over = dcopf.evaluate_states_screened(
            sys_, down, load, max_lp, compat, ipm, "proportional",
            repair_buffer=rbuf)
        return (jnp.sum(res.dns_mw), n_over)

    key = jax.random.key(5)
    out = {"batch": batch, "finish_buffer": fbuf, "repair_buffer": rbuf}
    for name, fn in (("kernel", k_only), ("kernel+finish", k_fin),
                     ("kernel+finish+lp", k_fin_lp),
                     ("jnp_tier1", jnp_t1), ("jnp_full", jnp_full)):
        out[name] = measure(fn, key, batch)
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
