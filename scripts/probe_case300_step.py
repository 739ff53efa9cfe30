"""Warm-timing breakdown of the case300s NSQ batch step (round-3
VERDICT items 1-2: the scale-up throughput lever).

At m = 792 the committed scale-up runs at ~125 samples/s incl compile
(results/case300_scaleup.json). This probe decomposes ONE warm device
batch (B = 8192) into its stages so the optimization target is measured,
not guessed:

  sample      threefry Bernoulli draw                     [B, 888]
  certify     rank-4 Woodbury certificates, hinted repair
  screened    full evaluate_states_screened (certify + LP tail)
  lp_r1e2     LP alone at max_lp lanes (restarts=1, escalate=2: prod)
  lp_r1e0     LP alone (restarts=1, escalate=0)
  lp_r0e0     LP alone (restarts=0, escalate=0: single pass)

plus the certificate miss count over 8 fresh batches (sizes max_lp).

Timing hygiene per CLAUDE.md: fresh PRNG keys per rep (the pooled relay
caches repeated (executable, input) pairs), block_until_ready, min over
reps, and every shape static across reps.

Usage: python scripts/probe_case300_step.py [--batch 8192] [--out ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import powersystemsreliabilityassessment_tpu  # noqa: F401  (matmul precision)
import jax
import jax.numpy as jnp

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines import dcopf
from powersystemsreliabilityassessment_tpu.sampling.state import sample_states
from powersystemsreliabilityassessment_tpu.utils.config import (
    CompatFlags, IPMConfig)


# Session-unique key offset: the pooled relay caches results for
# repeated (executable, inputs) pairs ACROSS processes/sessions, so a
# rerun of this probe with fixed keys returns 0.0 s readings for any
# stage whose program bytes didn't change (observed: lp_r0e0 "min 0.0").
_KEY_SALT = int(time.time()) % 1_000_000_007


def timed(fn, key0: int, reps: int = 4):
    """min/median wall seconds over reps, fresh key per rep."""
    walls = []
    for r in range(reps):
        key = jax.random.key(_KEY_SALT + key0 + r)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(key))
        walls.append(time.perf_counter() - t0)
    return {"min_s": round(min(walls), 4),
            "med_s": round(sorted(walls)[len(walls) // 2], 4)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--max-lp", type=int, default=128)
    ap.add_argument("--out", default="results/case300_step_profile.json")
    args = ap.parse_args()

    case = cases.case300s()
    sys_ = build_system(case)
    B = args.batch
    compat = CompatFlags()
    hint = dcopf.calibrate_shed_hint(sys_)
    hint_j = None if hint is None else jnp.asarray(hint, jnp.float32)
    rb = dcopf.default_repair_buffer(B, hinted=hint is not None)
    wk = 4
    n = sys_.n_gen + sys_.n_load + sys_.n_branch + sys_.n_bus
    out = {"case": case.name, "batch": B, "m": sys_.n_bus + sys_.n_branch,
           "n_vars": n, "max_lp": args.max_lp,
           "repair_buffer": rb, "woodbury_k": wk,
           "backend": jax.default_backend(), "key_salt": _KEY_SALT,
           "stages": {}}

    def draw(key):
        return sample_states(key, sys_.unavail, sys_.always_up_nsq, B)

    load = jnp.broadcast_to(sys_.load_pd[None, :], (B, sys_.n_load))

    @jax.jit
    def stage_sample(key):
        return draw(key)

    @jax.jit
    def stage_certify(key):
        down = draw(key)
        c = dcopf.certify_states(
            sys_, down, load,
            shed_hint=jnp.broadcast_to(hint_j[None, :], load.shape)
            if hint_j is not None else None,
            repair_buffer=rb, woodbury_k=wk)
        return c.certified, c.deficit

    def make_screened(ipm, max_lp=None, pf_buffer=None):
        @jax.jit
        def stage_screened(key):
            down = draw(key)
            res, n_over = dcopf.evaluate_states_screened(
                sys_, down, load, max_lp or args.max_lp, compat, ipm,
                "proportional", repair_buffer=rb, woodbury_k=wk,
                shed_hint=hint_j, pf_buffer=pf_buffer)
            return res.dns_mw, n_over
        return stage_screened

    def make_lp(ipm):
        # LP tail alone: evaluate_states on max_lp lanes drawn from the
        # batch (the compaction itself is ~free; lanes here are arbitrary
        # which UPPER-bounds the prod cost - real LP lanes are mostly
        # easy DNS=0 states).
        @jax.jit
        def stage_lp(key):
            down = draw(key)[: args.max_lp]
            res = dcopf.evaluate_states(
                sys_, down, load[: args.max_lp], compat, ipm, wk)
            return res.dns_mw
        return stage_lp

    t0 = time.perf_counter()
    out["stages"]["sample"] = timed(stage_sample, 100)
    out["stages"]["sample"]["compile_s"] = 0.0
    print("sample", out["stages"]["sample"], flush=True)

    t0 = time.perf_counter()
    jax.block_until_ready(stage_certify(jax.random.key(1)))
    c_compile = time.perf_counter() - t0
    out["stages"]["certify"] = timed(stage_certify, 200)
    out["stages"]["certify"]["compile_s"] = round(c_compile, 1)
    print("certify", out["stages"]["certify"], flush=True)

    pf = dcopf.default_pf_buffer(sys_, B)
    for name, fn in [
            ("screened_prod", make_screened(IPMConfig())),
            ("screened_pf", make_screened(IPMConfig(), pf_buffer=pf)),
            ("screened_pf_lp32", make_screened(IPMConfig(), max_lp=32,
                                               pf_buffer=pf)),
            ("lp_r1e2", make_lp(IPMConfig())),
            ("lp_r0e0", make_lp(IPMConfig(restarts=0, escalate_passes=0))),
    ]:
        t0 = time.perf_counter()
        first = fn(jax.random.key(2))
        jax.block_until_ready(first)
        comp = time.perf_counter() - t0
        out["stages"][name] = timed(fn, 300)
        out["stages"][name]["compile_s"] = round(comp, 1)
        if name.startswith("screened"):
            out["stages"][name]["n_overflow_warm"] = int(first[1])
        print(name, out["stages"][name], flush=True)

    # Certificate miss counts over 8 fresh batches (sizes max_lp).
    misses = []
    for r in range(8):
        cert, _ = stage_certify(jax.random.key(900 + r))
        misses.append(int(B - np.asarray(jnp.sum(cert))))
    out["miss_per_batch"] = misses
    out["miss_frac_mean"] = round(float(np.mean(misses)) / B, 6)
    print("misses", misses, flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
