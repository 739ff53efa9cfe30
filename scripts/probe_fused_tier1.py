"""Hardware validation + A/B for the fused sampler+certificate path.

(a) Parity on TPU: draw one 262144-state batch with the kernel's
    hardware PRNG, then check its quick-pass certificate against the
    jnp ``certify_states`` on the SAME states (soundness subset +
    deficit match + composed-finish equality), plus per-component
    failure-rate z-scores of the hardware stream.
(b) Throughput: interleaved same-process A/B of the full production
    step (sample -> tier-1 -> compacted LP -> reductions), default
    threefry/jnp path vs fused kernel + certify_finish. Fresh key per
    repetition (the relay caches repeated inputs); best + median over
    segments, same discipline as bench.py.

Usage: python scripts/probe_fused_tier1.py [--batch 262144] [--segs 6]
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


def measure(step, key, batch, seg_iters, n_segments):
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
    return (round(max(rates), 1),
            round(float(np.median(rates)), 1))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--segs", type=int, default=6)
    ap.add_argument("--seg-iters", type=int, default=5)
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    from powersystemsreliabilityassessment_tpu.core import cases
    from powersystemsreliabilityassessment_tpu.core.system import build_system
    from powersystemsreliabilityassessment_tpu.engines import dcopf
    from powersystemsreliabilityassessment_tpu.ops import fused_sampler_cert as fsc
    from powersystemsreliabilityassessment_tpu.sampling.state import (
        sample_states)
    from powersystemsreliabilityassessment_tpu.utils.config import (
        CompatFlags, IPMConfig)

    compat, ipm = CompatFlags(), IPMConfig()
    sys_ = build_system(cases.rts24(), CompatFlags())
    batch = args.batch
    max_lp = 256
    out: dict = {"batch": batch, "backend": jax.default_backend()}

    if not args.skip_parity:
        # Parity at PRODUCTION config: calibrated hint in both the
        # kernel and the jnp reference (same candidate family, so the
        # certified sets must match exactly after the finish pass).
        phint = dcopf.calibrate_shed_hint(sys_)
        phint_arr = None if phint is None else jnp.asarray(phint)
        key = jax.random.key(42)
        down, ok1, deficit, shed = fsc.sample_certify_quick(
            key, sys_, batch, shed_hint=phint_arr)
        down, ok1 = jax.device_get(down), np.asarray(ok1)
        load = jnp.broadcast_to(sys_.load_pd[None, :],
                                (batch, sys_.n_load))
        hint_b = (None if phint_arr is None else jnp.broadcast_to(
            phint_arr[None, :], load.shape))
        ref = dcopf.certify_states(sys_, jnp.asarray(down), load,
                                   shed_hint=hint_b, woodbury_k=2)
        refc = np.asarray(ref.certified)
        fin = dcopf.certify_finish(
            sys_, jnp.asarray(down), load, deficit, shed,
            jnp.asarray(ok1),
            dcopf.default_finish_buffer(batch, hinted=phint is not None),
            woodbury_k=2)
        finc = np.asarray(fin.certified)
        # hardware-stream failure-rate z-scores
        q = np.asarray(sys_.unavail, np.float64)
        q = np.where(np.asarray(sys_.always_up_nsq), 0.0, q)
        cnt = down.astype(np.int64).sum(axis=0)
        sd = np.sqrt(np.maximum(batch * q * (1 - q), 1e-12))
        z = (cnt - batch * q) / np.where(sd > 0, sd, 1.0)
        out["parity"] = {
            "ok1_frac": round(float(ok1.mean()), 6),
            "sound_subset": bool((~ok1 | refc).all()),
            "deficit_maxdiff": float(np.max(np.abs(
                np.asarray(deficit) - np.asarray(ref.deficit)))),
            "finish_equals_full": bool((finc == refc).all()),
            "finish_mismatch": int((finc != refc).sum()),
            "lp_routed_default": int((~refc).sum()),
            "lp_routed_fused": int((~finc).sum()),
            "pinned_never_fail": bool((cnt[np.asarray(
                sys_.always_up_nsq)] == 0).all()),
            "max_abs_z": round(float(np.max(np.abs(z))), 2),
        }
        print("parity", json.dumps(out["parity"]), flush=True)

    # Both arms run their PRODUCTION config: the one-time calibrated
    # shed hint (dcopf.calibrate_shed_hint) and the matching hinted
    # buffer sizes.
    hint = dcopf.calibrate_shed_hint(sys_)
    hint_arr = None if hint is None else jnp.asarray(hint)
    out["hinted"] = hint is not None

    @jax.jit
    def step_default(key):
        down = sample_states(key, sys_.unavail, sys_.always_up_nsq, batch)
        load = jnp.broadcast_to(sys_.load_pd[None, :],
                                (batch, sys_.n_load))
        res, n_over = dcopf.evaluate_states_screened(
            sys_, down, load, max_lp, compat, ipm, "proportional",
            repair_buffer=dcopf.default_repair_buffer(
                batch, hinted=hint is not None),
            shed_hint=hint_arr)
        return (jnp.sum(res.dns_mw), jnp.sum(res.failure), n_over)

    @jax.jit
    def step_fused(key):
        down, ok1, deficit, shed = fsc.sample_certify_quick(
            key, sys_, batch, shed_hint=hint_arr)
        load = jnp.broadcast_to(sys_.load_pd[None, :],
                                (batch, sys_.n_load))
        pre = dcopf.certify_finish(
            sys_, down, load, deficit, shed, ok1,
            dcopf.default_finish_buffer(batch, hinted=hint is not None),
            woodbury_k=2)
        res, n_over = dcopf.evaluate_states_screened(
            sys_, down, load, max_lp, compat, ipm, "proportional",
            pre=pre)
        return (jnp.sum(res.dns_mw), jnp.sum(res.failure), n_over)

    key = jax.random.key(7)
    # Interleave the arms so pool weather hits both equally.
    b_d, m_d = measure(step_default, key, batch, args.seg_iters, args.segs)
    b_f, m_f = measure(step_fused, key, batch, args.seg_iters, args.segs)
    b_d2, m_d2 = measure(step_default, jax.random.key(8), batch,
                         args.seg_iters, args.segs)
    b_f2, m_f2 = measure(step_fused, jax.random.key(9), batch,
                         args.seg_iters, args.segs)
    out["default"] = {"best": max(b_d, b_d2),
                      "median": round((m_d + m_d2) / 2, 1)}
    out["fused"] = {"best": max(b_f, b_f2),
                    "median": round((m_f + m_f2) / 2, 1)}
    out["speedup_median"] = round(out["fused"]["median"]
                                  / out["default"]["median"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
