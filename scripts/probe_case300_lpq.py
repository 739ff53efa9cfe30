"""Post-pass-1 LP quality distribution + B-scaling at case300s (m=792).

Sizes the compacted-restart design (restart/escalation only on the
worst-k lanes after the first IPM pass):

(a) For REAL certificate-miss lanes (compacted exactly like
    evaluate_states_screened does): per-lane quality score
    (primal_residual + 2n*gap) after a single pass (restarts=0,
    escalate=0), vs after the production config — how many lanes per
    batch actually need the second pass, and what the skipped lanes'
    scores look like.
(b) LP wall vs buffer size B in {32, 64, 128} at restarts=0: is the
    batched XLA path linear in B (compaction pays) or flat (it doesn't)?

Usage: python scripts/probe_case300_lpq.py
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


def main() -> None:
    case = cases.case300s()
    sys_ = build_system(case)
    B, max_lp, wk = 8192, 128, 4
    compat = CompatFlags()
    rb = dcopf.default_repair_buffer(B, hinted=False)
    load = jnp.broadcast_to(sys_.load_pd[None, :], (B, sys_.n_load))
    out = {"case": case.name, "batch": B, "max_lp": max_lp, "quality": {},
           "b_scaling": {}}

    @jax.jit
    def misses(key):
        down = sample_states(key, sys_.unavail, sys_.always_up_nsq, B)
        c = dcopf.certify_states(sys_, down, load, repair_buffer=rb,
                                 woodbury_k=wk)
        need = ~c.certified
        score = need.astype(jnp.int32) * (2 * B) - np.arange(
            B, dtype=np.int32)
        _, idx = jax.lax.top_k(score, max_lp)
        return down[idx], jnp.sum(need)

    def make_eval(ipm, nlanes):
        @jax.jit
        def ev(down_sub):
            res = dcopf.evaluate_states(
                sys_, down_sub[:nlanes], load[:nlanes], compat, ipm, wk)
            return res.dns_mw, res.primal_residual
        return ev

    ev_1pass = make_eval(IPMConfig(restarts=0, escalate_passes=0), max_lp)
    ev_prod = make_eval(IPMConfig(), max_lp)

    qmax1, n_above = [], {1e-4: 0, 3e-4: 0, 1e-3: 0, 5e-3: 0}
    lanes_tot = 0
    dns_diff = []
    for r in range(6):
        sub, n_need = misses(jax.random.key(700 + r))
        n_need = int(n_need)
        d1, q1 = ev_1pass(sub)
        dp, qp = ev_prod(sub)
        q1 = np.asarray(q1)[:n_need]
        d1 = np.asarray(d1)[:n_need]
        dp = np.asarray(dp)[:n_need]
        lanes_tot += n_need
        qmax1.append(float(q1.max()) if n_need else 0.0)
        for tol in n_above:
            n_above[tol] += int((q1 > tol).sum())
        dns_diff.append(float(np.abs(d1 - dp).max()) if n_need else 0.0)
    out["quality"] = {
        "real_miss_lanes": lanes_tot,
        "pass1_batch_qmax": [round(v, 5) for v in qmax1],
        "pass1_lanes_above": {str(k): v for k, v in n_above.items()},
        "dns_absdiff_pass1_vs_prod_mw": [round(v, 3) for v in dns_diff],
    }
    print("quality", json.dumps(out["quality"]), flush=True)

    for nb in (32, 64, 128):
        ev = make_eval(IPMConfig(restarts=0, escalate_passes=0), nb)
        sub, _ = misses(jax.random.key(700))
        jax.block_until_ready(ev(sub))            # compile
        walls = []
        for r in range(4):
            sub, _ = misses(jax.random.key(800 + r))
            jax.block_until_ready(sub)
            t0 = time.perf_counter()
            jax.block_until_ready(ev(sub))
            walls.append(time.perf_counter() - t0)
        out["b_scaling"][nb] = round(min(walls), 4)
        print("B", nb, out["b_scaling"][nb], flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/case300_lpq.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
