"""Validate the rank-4 Woodbury certificate on hardware (round-3 #1).

One process (one relay admission), three measurements:
  A. case300s certified fraction, woodbury_k 2 vs 4 (repair 0 / 3),
     B=8192 — the round-3 miss-anatomy probe showed 88% of misses were
     n_out >= 3 ineligibility (results/case300_cert_breakdown.json).
  B. RTS-24 bench-path step A/B (B=262144, interleaved segments):
     rank-4 slots add 2 extra one-hot matmuls on the hot path — measure
     the cost/benefit on the headline metric.
  C. certified-lane exactness spot check vs f64 HiGHS on forced
     3/4-outage case300s states.

Usage: python scripts/probe_woodbury4.py [--out results/woodbury4.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/woodbury4.json")
    ap.add_argument("--bench-segs", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from powersystemsreliabilityassessment_tpu.core import cases
    from powersystemsreliabilityassessment_tpu.core.system import build_system
    from powersystemsreliabilityassessment_tpu.engines import dcopf
    from powersystemsreliabilityassessment_tpu.parallel import mesh as meshlib
    from powersystemsreliabilityassessment_tpu.sampling.state import (
        sample_states)
    from powersystemsreliabilityassessment_tpu.utils.config import (
        CompatFlags, IPMConfig)

    compat, ipm = CompatFlags(), IPMConfig()
    out: dict = {}
    meshlib.warmup_backend()

    # --- A: case300s certified fraction ---------------------------------
    sys3 = build_system(cases.case300s(), compat)
    B3 = 8192
    key = jax.random.key(3)
    down3 = sample_states(key, sys3.unavail, sys3.always_up_nsq, B3)
    load3 = jnp.broadcast_to(sys3.load_pd[None, :], (B3, sys3.n_load))
    n_out = np.asarray(down3)[:, sys3.n_gen:].sum(axis=1)
    out["case300_n_out_hist"] = {
        str(k): int(np.sum(n_out == k)) for k in range(6)}
    caseA = {}
    for wk in (2, 4):
        for ri in (0, 3):
            fn = jax.jit(lambda d, ld, ri=ri, wk=wk: dcopf.certify_states(
                sys3, d, ld, repair_iters=ri, woodbury_k=wk))
            cert = fn(down3, load3)
            jax.block_until_ready(cert.certified)
            t0 = time.perf_counter()
            cert = fn(down3, load3)
            cm = np.asarray(cert.certified)
            t = time.perf_counter() - t0
            caseA[f"k{wk}_r{ri}"] = {
                "certified_frac": round(float(cm.mean()), 5),
                "warm_ms": round(1e3 * t, 1)}
            print(f"case300s woodbury_k={wk} repair={ri}: certified "
                  f"{cm.mean():.4f} ({1e3*t:.1f} ms)", flush=True)
    out["case300_cert"] = caseA

    # --- B: RTS-24 bench step A/B ---------------------------------------
    sys24 = build_system(cases.rts24(), compat)
    B = 262144
    max_lp = 256

    def make_step(wk):
        @jax.jit
        def step(key):
            down = sample_states(key, sys24.unavail, sys24.always_up_nsq, B)
            load = jnp.broadcast_to(sys24.load_pd[None, :],
                                    (B, sys24.n_load))
            res, n_over = dcopf.evaluate_states_screened(
                sys24, down, load, max_lp, compat, ipm, "proportional",
                repair_buffer=dcopf.default_repair_buffer(B),
                woodbury_k=wk)
            return jnp.sum(res.dns_mw), jnp.sum(res.failure), n_over
        return step

    steps = {2: make_step(2), 4: make_step(4)}
    key = jax.random.key(0)
    for s in steps.values():
        jax.block_until_ready(s(key))
    it = 0
    rates: dict[int, list] = {2: [], 4: []}
    for _ in range(args.bench_segs):
        for wk, s in steps.items():           # interleaved A/B
            t0 = time.perf_counter()
            for _ in range(5):
                o = s(jax.random.fold_in(key, it))
                it += 1
            jax.block_until_ready(o)
            rates[wk].append(B * 5 / (time.perf_counter() - t0))
    for wk in (2, 4):
        out[f"bench_k{wk}"] = {
            "best_scen_per_s": round(max(rates[wk]), 0),
            "median_scen_per_s": round(float(np.median(rates[wk])), 0)}
        print(f"bench woodbury_k={wk}: best {max(rates[wk])/1e6:.2f}M "
              f"median {np.median(rates[wk])/1e6:.2f}M scen/s", flush=True)

    # --- C: certified-lane exactness vs f64 HiGHS on case300s -----------
    from scipy.optimize import linprog
    rng = np.random.default_rng(5)
    nC = 12
    ng, nl = sys3.n_gen, sys3.n_branch
    downC = np.zeros((nC, sys3.n_comp), bool)
    for i in range(nC):
        k = 3 if i % 2 == 0 else 4
        downC[i, ng + rng.choice(nl, size=k, replace=False)] = True
        downC[i, rng.choice(ng, size=6, replace=False)] = True
    loadC = jnp.broadcast_to(sys3.load_pd[None, :], (nC, sys3.n_load))
    cert = dcopf.certify_states(sys3, jnp.asarray(downC), loadC)
    cm = np.asarray(cert.certified)
    errs = []
    for i in np.nonzero(cm)[0]:
        up = 1.0 - downC[i].astype(np.float32)
        c, A, b, l, u = dcopf.build_state_lp(
            sys3, jnp.asarray(up[:ng]), jnp.asarray(up[ng:ng + nl]),
            loadC[i], compat, ipm.theta_max)
        r = linprog(np.asarray(c, np.float64), A_eq=np.asarray(A, np.float64),
                    b_eq=np.asarray(b, np.float64),
                    bounds=list(zip(np.asarray(l, np.float64),
                                    np.asarray(u, np.float64))),
                    method="highs")
        assert r.status == 0, r.message
        errs.append(abs(float(cert.deficit[i]) * float(sys3.base_mva)
                        - float(r.fun) * float(sys3.base_mva)))
    out["case300_oracle"] = {
        "n_states": nC, "n_certified": int(cm.sum()),
        "max_abs_err_mw": round(max(errs), 6) if errs else None}
    print(f"case300s forced 3/4-outage: {int(cm.sum())}/{nC} certified, "
          f"max |err| {max(errs) if errs else 0:.6f} MW", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
