"""Round-5: right-size the NSQ LP buffer under the island-PF tier.

With pf_buffer wired (production default since round 4), case300s
tier-2 misses are ~8.6 lanes/8192 (results/r4_miss.json), but
default_max_lp still sizes the LP buffer at batch//64 (128-256 lanes)
— and the block-Schur LP pass scales ~linearly in buffer lanes
(results/case300_bigbatch.json lp_scaling). This probe times the FULL
production screened step (certificates + island-PF tier + LP + rescue)
at several buffer sizes, with the DNS cross-check on fixed keys proving
the estimates identical (no overflow at any size).

Usage: python scripts/probe_r5_maxlp_pf.py [--out results/r5_maxlp_pf.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import powersystemsreliabilityassessment_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines import dcopf
from powersystemsreliabilityassessment_tpu.sampling.state import sample_states
from powersystemsreliabilityassessment_tpu.utils.config import (
    CompatFlags, IPMConfig)

_KEY_SALT = int(time.time()) % 1_000_000_007


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="results/r5_maxlp_pf.json")
    args = ap.parse_args()

    case = cases.case300s()
    sys_ = build_system(case)
    B = args.batch
    compat, ipm = CompatFlags(), IPMConfig()
    hint = dcopf.calibrate_shed_hint(sys_)
    hint_j = None if hint is None else jnp.asarray(hint, jnp.float32)
    rb = dcopf.default_repair_buffer(B, hinted=hint is not None)
    load = jnp.broadcast_to(sys_.load_pd[None, :], (B, sys_.n_load))
    pf = dcopf.default_pf_buffer(sys_, B)

    def make(max_lp):
        @jax.jit
        def f(key):
            down = sample_states(key, sys_.unavail, sys_.always_up_nsq, B)
            res, n_over = dcopf.evaluate_states_screened(
                sys_, down, load, max_lp, compat, ipm,
                "proportional", repair_buffer=rb, woodbury_k=4,
                shed_hint=hint_j, pf_buffer=pf)
            return jnp.sum(res.dns_mw), n_over
        return f

    acc_keys = [jax.random.key(_KEY_SALT + 31 + i) for i in range(3)]
    out = {"case": case.name, "batch": B, "pf_buffer": pf,
           "key_salt": _KEY_SALT, "backend": jax.default_backend(),
           "arms": {}}
    base_dns = None
    for max_lp in (256, 128, 64, 32):
        fn = make(max_lp)
        t0 = time.perf_counter()
        dns, overs = [], 0
        for k in acc_keys:
            d, o = fn(k)
            dns.append(float(d))
            overs += int(o)
        comp = time.perf_counter() - t0
        if base_dns is None:
            base_dns = dns
        walls = []
        for r in range(args.reps):
            key = jax.random.key(_KEY_SALT + 1000 * max_lp + r)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(key))
            walls.append(time.perf_counter() - t0)
        out["arms"][str(max_lp)] = {
            "min_s": round(min(walls), 4),
            "med_s": round(sorted(walls)[len(walls) // 2], 4),
            "compile_plus_acc_s": round(comp, 1),
            "overflow_states_acc": overs,
            "dns_absdiff_vs_256_mw": round(
                max(abs(a - b) for a, b in zip(dns, base_dns)), 4),
        }
        print(max_lp, out["arms"][str(max_lp)], flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
