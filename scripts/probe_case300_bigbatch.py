"""Big-batch amortization of the case300s LP tail (round-3 scale lever).

scripts/probe_case300_lpq.py measured the m=792 batched LP wall FLAT in
buffer size (0.99 s at B = 32/64/128, single pass): the pass is
latency-bound on the 792x792 normal-equation critical path, not
throughput-bound. If that holds to B ~ 256-512, the scale-up step
should sample a MUCH larger batch per LP dispatch: certify scales
linearly (~28 ms per 8192), the LP tail stays ~flat, so samples/s
grows almost linearly with batch until the LP knee.

Measures:
  (a) single-pass LP wall at B in {128, 256, 512} (memory-bounded:
      the generic path materializes ~3x [B, 792, 1392] f32 = 13 GB at
      B=1024, too big for one v5e chip);
  (b) full evaluate_states_screened warm step at
      (batch, max_lp) in {(8192,128), (32768,256), (65536,512)}
      with the production IPMConfig -> samples/s.

Usage: python scripts/probe_case300_bigbatch.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import powersystemsreliabilityassessment_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines import dcopf
from powersystemsreliabilityassessment_tpu.sampling.state import sample_states
from powersystemsreliabilityassessment_tpu.utils.config import (
    CompatFlags, IPMConfig)


def timed(fn, key0: int, reps: int = 3):
    walls = []
    for r in range(reps):
        key = jax.random.key(key0 + r)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(key))
        walls.append(time.perf_counter() - t0)
    return {"min_s": round(min(walls), 4),
            "med_s": round(sorted(walls)[len(walls) // 2], 4)}


def main() -> None:
    case = cases.case300s()
    sys_ = build_system(case)
    compat = CompatFlags()
    hint = dcopf.calibrate_shed_hint(sys_)
    hint_j = None if hint is None else jnp.asarray(hint, jnp.float32)
    wk = 4
    out = {"case": case.name, "m": 792, "backend": jax.default_backend(),
           "lp_scaling": {}, "steps": {}}

    # (a) single-pass LP wall vs buffer size.
    one_pass = IPMConfig(restarts=0, escalate_passes=0)
    for nb in (128, 256, 512):
        load = jnp.broadcast_to(sys_.load_pd[None, :], (nb, sys_.n_load))

        @jax.jit
        def lp_only(key, load=load, nb=nb):
            down = sample_states(key, sys_.unavail, sys_.always_up_nsq, nb)
            res = dcopf.evaluate_states(sys_, down, load, compat,
                                        one_pass, wk)
            return res.dns_mw

        try:
            t0 = time.perf_counter()
            jax.block_until_ready(lp_only(jax.random.key(1)))
            comp = round(time.perf_counter() - t0, 1)
            out["lp_scaling"][nb] = {**timed(lp_only, 400),
                                     "compile_s": comp}
        except Exception as e:  # OOM at the big sizes: record and move on
            out["lp_scaling"][nb] = {"error": str(e)[:200]}
        print("lp", nb, out["lp_scaling"][nb], flush=True)

    # (b) full screened step at growing (batch, max_lp).
    prod = IPMConfig()
    for batch, max_lp in ((8192, 128), (32768, 256), (65536, 512)):
        rb = dcopf.default_repair_buffer(batch, hinted=hint is not None)
        load = jnp.broadcast_to(sys_.load_pd[None, :],
                                (batch, sys_.n_load))

        @jax.jit
        def step(key, load=load, batch=batch, max_lp=max_lp, rb=rb):
            down = sample_states(key, sys_.unavail, sys_.always_up_nsq,
                                 batch)
            res, n_over = dcopf.evaluate_states_screened(
                sys_, down, load, max_lp, compat, prod, "proportional",
                repair_buffer=rb, woodbury_k=wk, shed_hint=hint_j)
            return res.dns_mw, n_over

        try:
            t0 = time.perf_counter()
            d, n_over = step(jax.random.key(2))
            jax.block_until_ready(d)
            comp = round(time.perf_counter() - t0, 1)
            r = timed(step, 500)
            r["compile_s"] = comp
            r["overflow"] = int(n_over)
            r["samples_per_s"] = round(batch / r["min_s"])
        except Exception as e:
            r = {"error": str(e)[:200]}
        out["steps"][f"{batch}x{max_lp}"] = r
        print("step", batch, max_lp, r, flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/case300_bigbatch.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
