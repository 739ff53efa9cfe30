"""Bisect certify_finish's cost (measured 33.8 ms at fbuf=32768,
B=262144 — scripts/probe_fused_stages.py) into its phases:

  a kernel+need      : kernel + the need mask/n_out reduction only
  b +topk            : + top_k compaction (the sort)
  c +gather+recheck  : + lane gathers, candidate recompute, first
                       f32 re-check
  d +repair+woodbury : + the 3-iter descent and rank-2 Woodbury
  e +scatter (=full) : + the three scatter-backs (certify_finish)

All variants reduce to scalars. Fresh key per rep.
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
    return round(batch / med * 1e3, 2)


def main() -> None:
    from powersystemsreliabilityassessment_tpu.core import cases
    from powersystemsreliabilityassessment_tpu.core.system import build_system
    from powersystemsreliabilityassessment_tpu.engines import dcopf
    from powersystemsreliabilityassessment_tpu.engines.dcopf import (
        _dispatch_candidate, _repair_descent, _shed_candidate,
        _woodbury_multi_ok)
    from powersystemsreliabilityassessment_tpu.ops import (
        fused_sampler_cert as fsc)
    from powersystemsreliabilityassessment_tpu.utils.config import CompatFlags

    sys_ = build_system(cases.rts24(), CompatFlags())
    batch = 262144
    fbuf = 32768
    ng = sys_.n_gen
    dt = jnp.float32

    def prefix(key, upto):
        down, ok1, deficit, shed = fsc.sample_certify_quick(key, sys_,
                                                            batch)
        load_pu = jnp.broadcast_to(sys_.load_pd[None, :],
                                   (batch, sys_.n_load))
        B = batch
        br_down_full = down[:, ng:].astype(dt)
        n_out_full = jnp.sum(br_down_full, axis=1)
        need = ~ok1 & (n_out_full <= 2)
        if upto == "a":
            return jnp.sum(need), jnp.sum(deficit)
        score = need.astype(jnp.int32) * (2 * B) - np.arange(
            B, dtype=np.int32)
        _, idx = jax.lax.top_k(score, fbuf)
        valid = (np.arange(fbuf, dtype=np.int32) < jnp.sum(need)) \
            & need[idx]
        if upto == "b":
            return jnp.sum(idx), jnp.sum(valid)
        lp_ = load_pu[idx]
        gen_up_ = 1.0 - down[idx, :ng].astype(dt)
        brd_ = br_down_full[idx]
        deficit_ = deficit[idx]
        load_tot_ = jnp.sum(lp_, axis=1)
        served_ = load_tot_ - deficit_
        cand_ = _shed_candidate(sys_, lp_, deficit_, load_tot_, shed[idx])
        gen_cap_ = sys_.gen_pmax[None, :] * gen_up_
        disp_ = _dispatch_candidate(sys_, gen_cap_, lp_, cand_, served_)
        inj = (disp_ @ sys_.gen_bus_onehot.T + cand_ @ sys_.load_onehot.T
               - lp_ @ sys_.load_onehot.T)
        flows_ = inj @ sys_.ptdf.T
        post0_ = (flows_ + (brd_ * flows_) @ sys_.lodf.T) * (1.0 - brd_)
        rate_ok = sys_.br_rate[None, :] + 1e-4
        elig_ = jnp.sum(brd_, axis=1) <= 1
        ok0_ = elig_ & jnp.all(jnp.abs(post0_) <= rate_ok, axis=1)
        if upto == "c":
            return jnp.sum(ok0_), jnp.sum(flows_)
        ptdf_gen = sys_.ptdf @ sys_.gen_bus_onehot
        ptdf_load = sys_.ptdf @ sys_.load_onehot
        okr, bshed_, bdisp_ = _repair_descent(
            sys_, 3, rate_ok, ptdf_gen, ptdf_load,
            lp_, cand_, disp_, gen_cap_, brd_, served_, deficit_,
            post0_, ok0_)
        cert_ = (elig_ & okr) | _woodbury_multi_ok(
            sys_, flows_, brd_, jnp.sum(brd_, axis=1), rate_ok, 2)
        if upto == "d":
            return jnp.sum(cert_), jnp.sum(bshed_)
        upd = valid & cert_
        certified = ok1.at[idx].set(ok1[idx] | upd)
        shed2 = shed.at[idx].set(jnp.where(upd[:, None], bshed_,
                                           shed[idx]))
        dispatch = jnp.zeros((B, ng), dt)
        dispatch = dispatch.at[idx].set(jnp.where(upd[:, None], bdisp_,
                                                  dispatch[idx]))
        return jnp.sum(certified), jnp.sum(shed2), jnp.sum(dispatch)

    key = jax.random.key(5)
    out = {}
    for stage in ("a", "b", "c", "d", "e"):
        fn = jax.jit(lambda k, s=stage: prefix(k, s))
        out[stage] = measure(fn, key, batch)
        print(stage, out[stage], "ms", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
