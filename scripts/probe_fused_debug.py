"""Isolate WHY the fused sampler+cert kernel's first pass misses lanes.

Round-3 probe: on hardware the kernel's ok1_frac measured 0.917 vs the
jnp quick pass ~0.996 (scripts/probe_fused_tier1.py). Three suspects:
  (a) the rigorous rounding guard band is wider than estimated;
  (b) the DEFAULT-precision (1-pass bf16) dispatch-fraction dots move
      the candidate enough to genuinely violate near-binding lines;
  (c) a plain logic bug (n_out gating, islanding columns, ...).

Method: draw one explicit threefry state batch, run the kernel on it
(down=..., so the PRNG is out of the picture), and recompute the exact
same pipeline in f32 jnp INCLUDING the guard band. Report per-class
agreement and the margin distribution of the disagreeing lanes.

Usage: python scripts/probe_fused_debug.py [--batch 262144]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=262144)
    args = ap.parse_args()

    from powersystemsreliabilityassessment_tpu.core import cases
    from powersystemsreliabilityassessment_tpu.core.system import build_system
    from powersystemsreliabilityassessment_tpu.engines import dcopf
    from powersystemsreliabilityassessment_tpu.ops import (
        fused_sampler_cert as fsc)
    from powersystemsreliabilityassessment_tpu.sampling.state import (
        sample_states)
    from powersystemsreliabilityassessment_tpu.utils.config import CompatFlags

    sys_ = build_system(cases.rts24(), CompatFlags())
    B = args.batch
    key = jax.random.key(11)
    down = sample_states(key, sys_.unavail, sys_.always_up_nsq, B)

    _, ok1_k, deficit_k, shed_k = fsc.sample_certify_quick(
        key, sys_, B, down=down)

    ng, nd, nl = sys_.n_gen, sys_.n_load, sys_.n_branch
    dt = jnp.float32

    @jax.jit
    def jnp_quick(down):
        down = down.astype(dt)
        gen_down = down[:, :ng]
        br_down = down[:, ng:]
        gen_up = 1.0 - gen_down
        load_row = sys_.load_pd.astype(dt)[None, :]
        load_tot = jnp.sum(load_row)
        pmax = sys_.gen_pmax.astype(dt)[None, :]
        cap = jnp.sum(pmax) - jnp.sum(gen_down * pmax, axis=1,
                                      keepdims=True)
        deficit = jnp.maximum(load_tot - cap, 0.0)
        cand = load_row * (deficit / load_tot)
        served = load_tot - deficit
        gen_cap = pmax * gen_up
        served_bus = (load_row - cand) @ sys_.load_onehot.T
        cap_bus = gen_cap @ sys_.gen_bus_onehot.T
        local_frac = jnp.minimum(served_bus / jnp.maximum(cap_bus, 1e-9),
                                 1.0)
        disp_local = gen_cap * (local_frac @ sys_.gen_bus_onehot)
        total = jnp.sum(disp_local, axis=1, keepdims=True)
        resid = total - served
        down_scale = jnp.where(
            total > 1e-9,
            jnp.maximum(served, 0.0) / jnp.maximum(total, 1e-9), 0.0)
        headroom = jnp.maximum(gen_cap - disp_local, 0.0)
        head_tot = jnp.maximum(jnp.sum(headroom, axis=1, keepdims=True),
                               1e-9)
        up = disp_local + headroom * ((-resid) / head_tot)
        dispatch = jnp.where(resid >= 0, disp_local * down_scale,
                             jnp.minimum(up, gen_cap))
        loadbus = load_row @ sys_.load_onehot.T
        inj = (dispatch @ sys_.gen_bus_onehot.T
               + cand @ sys_.load_onehot.T - loadbus)
        flows = inj @ sys_.ptdf.T
        bound_f = fsc.EPS_HIGH * (jnp.abs(inj) @ jnp.abs(sys_.ptdf).T)
        g = (br_down * flows) @ sys_.lodf.T
        post = (flows + g) * (1.0 - br_down)
        bound_g = (br_down * (fsc.EPS_HIGH * jnp.abs(flows)
                              + 1.01 * bound_f)) @ jnp.abs(sys_.lodf).T
        bound_post = 1.01 * (bound_f + bound_g)
        rate = sys_.br_rate[None, :] + 1e-4
        n_out = jnp.sum(br_down, axis=1)
        margin_guard = jnp.min(rate - bound_post - jnp.abs(post), axis=1)
        margin_plain = jnp.min(rate - jnp.abs(post), axis=1)
        ok_guard = (margin_guard > 0) & (n_out <= 1.5)
        ok_plain = (margin_plain > 0) & (n_out <= 1.5)
        return ok_guard, ok_plain, margin_guard, margin_plain, n_out, \
            jnp.max(bound_post, axis=1)

    ok_g, ok_p, mg, mp, n_out, bmax = jax.device_get(jnp_quick(down))
    ok1_k = np.asarray(ok1_k)
    down_np = np.asarray(jax.device_get(down))
    intact = down_np.sum(axis=1) == 0

    def frac(x):
        return round(float(np.mean(x)), 5)

    # disagreement classes
    k_only_fail = ~ok1_k & ok_g          # kernel misses vs f32+guard
    out = {
        "batch": B,
        "ok1_kernel": frac(ok1_k),
        "ok1_f32_guard": frac(ok_g),
        "ok1_f32_plain": frac(ok_p),
        "intact_frac": frac(intact),
        "ok1_kernel_intact": frac(ok1_k[intact]),
        "ok1_kernel_outage": frac(ok1_k[~intact]),
        "guard_cost_lanes": int((ok_p & ~ok_g).sum()),
        "kernel_vs_guard_miss": int(k_only_fail.sum()),
        "kernel_vs_guard_miss_intact": int((k_only_fail & intact).sum()),
        "bound_post_max_p50": round(float(np.median(bmax)), 6),
        "bound_post_max_p99": round(float(np.percentile(bmax, 99)), 6),
        # margin stats of kernel-missed lanes: how far inside the f32
        # margin are they (i.e. how big is the kernel's own deviation)?
        "miss_margin_p50": round(float(np.median(mg[k_only_fail])), 6)
        if k_only_fail.any() else None,
        "miss_margin_p95": round(float(np.percentile(mg[k_only_fail], 95)),
                                 6) if k_only_fail.any() else None,
        "plain_margin_p01_all": round(float(np.percentile(mp, 1)), 6),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
