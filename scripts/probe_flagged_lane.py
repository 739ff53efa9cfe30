"""Rescue experiments for the residual m=792 guard-tripped lane.

results/case300_parity.json still shows one 128-lane stress state
(lane 82) whose IPM quality stalls at ~8.4e-3 (> the 5e-3 trust guard)
after the full restart + 2 escalation passes, degrading a ~1.1 MW shed
to its zero copper bound (VERDICT round-2 weak item 4 / next item 5).

This probe isolates the worst-quality lanes from the last parity npz
(/tmp/probe_quality_case300s_<backend>.npz, written by
scripts/parity_case300.py), rebuilds their LPs via dcopf.build_state_lp,
computes float64 HiGHS truth per lane, then A/Bs rescue strategies:

  prod            IPMConfig() as shipped
  esc4            4 escalation passes (insets 0.05/0.1/0.1/0.1)
  iters24/32      longer Mehrotra loops
  restarts2       two full restarts

Usage:
  python scripts/probe_flagged_lane.py [--cpu] [--npz PATH] [--lanes 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import powersystemsreliabilityassessment_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from scipy.optimize import linprog

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines import lp_ipm_batched
from powersystemsreliabilityassessment_tpu.engines.dcopf import build_state_lp
from powersystemsreliabilityassessment_tpu.utils.config import (
    CompatFlags, IPMConfig)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--npz", default=None)
    ap.add_argument("--lanes", type=int, default=8)
    args = ap.parse_args()

    backend = jax.default_backend()
    npz = args.npz or f"/tmp/probe_quality_case300s_{backend}.npz"
    if not os.path.exists(npz):
        npz = "/tmp/probe_quality_case300s_tpu.npz"
    d = np.load(npz)
    q, states = d["q"], d["states"]
    order = np.argsort(q)[::-1][: args.lanes]
    print(f"[{backend}] worst lanes {order.tolist()} q={q[order].round(5).tolist()}")

    case = cases.case300s()
    sys_ = build_system(case)
    ng, nd = int(sys_.n_gen), int(sys_.load_pd.shape[0])
    base = float(sys_.base_mva)
    compat = CompatFlags()
    load = jnp.asarray(sys_.load_pd, jnp.float32)

    lps = [build_state_lp(sys_, jnp.asarray(1.0 - s[:ng], jnp.float32),
                          jnp.asarray(1.0 - s[ng:], jnp.float32),
                          load, compat, IPMConfig().theta_max)
           for s in states[order]]
    c = jnp.stack([t[0] for t in lps])
    A = jnp.stack([t[1] for t in lps])
    b = jnp.stack([t[2] for t in lps])
    l = jnp.stack([t[3] for t in lps])
    u = jnp.stack([t[4] for t in lps])

    refs = []
    for i in range(len(order)):
        r = linprog(np.asarray(c[i], np.float64),
                    A_eq=np.asarray(A[i], np.float64),
                    b_eq=np.asarray(b[i], np.float64),
                    bounds=np.stack([np.asarray(l[i], np.float64),
                                     np.asarray(u[i], np.float64)], -1),
                    method="highs")
        assert r.status == 0, (i, r.message)
        refs.append(float(np.sum(r.x[ng:ng + nd])) * base)
    refs = np.asarray(refs)
    print("f64 shed MW:", refs.round(3).tolist())

    out = {"backend": backend, "lanes": order.tolist(),
           "f64_shed_mw": refs.round(4).tolist(), "configs": {}}
    for name, ipm in [
            ("prod", IPMConfig()),
            ("esc4", IPMConfig(escalate_passes=4)),
            ("iters24", IPMConfig(iterations=24)),
            ("iters32", IPMConfig(iterations=32)),
            ("restarts2", IPMConfig(restarts=2)),
    ]:
        t0 = time.perf_counter()
        sol = jax.jit(lambda: lp_ipm_batched.solve_box_lp_batched(
            c, A, b, l, u, ipm))()
        dns = np.asarray(jnp.sum(sol.x[:, ng:ng + nd], axis=1)) * base
        ql = np.asarray(sol.primal_residual
                        + 2 * c.shape[1] * sol.duality_gap)
        err = np.abs(dns - refs)
        out["configs"][name] = {
            "err_max_mw": round(float(err.max()), 4),
            "err_mw": err.round(3).tolist(),
            "q": [float(f"{v:.2e}") for v in ql],
            "trips": int((ql > 5e-3).sum()),
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        print(name, json.dumps(out["configs"][name]), flush=True)

    with open(f"/tmp/flagged_lane_{backend}.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
