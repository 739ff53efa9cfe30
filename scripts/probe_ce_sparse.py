"""Round-5 follow-up to the CE A/B failure (results/ce_ab.json): the
DENSE cross-entropy proposal loses 20x per-sample on case300s (weight
degeneracy) and 6.6x on throughput (certificate-closure destruction).
This probe tests the named next candidate — the per-cutset
deliverability tilt, realized as hl2_nsq.sparsify_ce_proposal: keep the
learned tilt only on the top-k components by q_hat/U ratio, capped, so
likelihood weights are bounded by ~1 + k*cap and the off-tilt state
distribution (hence tier-1/1.5 closure) is nearly unchanged.

One DENSE pilot is calibrated once (the CE marginals are consistent
estimates under any pilot proposal), then several sparsifications are
A/B'd against plain MC on the same metrics as probe_ce_ab.py
(per-sample rel-var of the EDNS estimator, warm rate, predicted
time-to-beta=0.05). Unbiasedness holds for every arm by construction
(exact likelihood ratios), so arms must agree on EDNS within ~2 sigma.

Usage: python scripts/probe_ce_sparse.py [--out results/ce_sparse.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import powersystemsreliabilityassessment_tpu as psra  # noqa: F401
import jax
import jax.numpy as jnp


def run_arm(sys_, mesh, arm: str, is_q, batches: int, batch: int,
            seed: int, hint, compat, ipm, max_lp) -> dict:
    from powersystemsreliabilityassessment_tpu.studies.hl2_nsq import (
        make_nsq_batch_step)

    n_dev = mesh.devices.size
    bpd = max(batch // n_dev, 1)

    def build(lp):
        return make_nsq_batch_step(
            sys_, mesh, bpd, compat, ipm, max_lp=lp,
            nodal_mode="proportional", shed_hint=hint, is_q=is_q)

    step = build(max_lp)
    root = jax.random.key(seed)
    t0 = time.perf_counter()
    out0 = step(jax.random.fold_in(root, 0))
    jax.block_until_ready(out0)
    compile_wall = time.perf_counter() - t0
    if int(out0[1]) > 0:
        max_lp = min(bpd, 2 * max_lp)
        step = build(max_lp)
        t0 = time.perf_counter()
        out0 = step(jax.random.fold_in(root, 0))
        jax.block_until_ready(out0)
        compile_wall += time.perf_counter() - t0

    S = {"n": 0.0, "f": 0.0, "f2": 0.0, "flag": 0.0}
    overflow = 0

    def fold(out):
        nonlocal overflow
        m = out[0]
        S["n"] += float(m.n)
        S["f"] += float(m.sum_dns)
        S["f2"] += float(m.sum_dns_sq)
        S["flag"] += float(m.sum_flag_raw)
        overflow += int(out[1])

    fold(out0)
    t0 = time.perf_counter()
    pending = [step(jax.random.fold_in(root, i)) for i in range(1, batches)]
    for out in pending:
        jax.block_until_ready(out)
        fold(out)
    warm_wall = time.perf_counter() - t0

    n = S["n"]
    mean = S["f"] / n
    rel_var = n * S["f2"] / max(S["f"] ** 2, 1e-30) - 1.0
    rate = (n - batch) / warm_wall
    return {
        "arm": arm, "n": int(n), "max_lp": max_lp,
        "edns_mw": round(mean, 5),
        "edns_se_mw": round(mean * np.sqrt(max(rel_var, 0.0) / n), 5),
        "plc_weighted": round(S["flag"] / n, 7),
        "rel_var": round(rel_var, 1),
        "warm_samples_per_s": round(rate, 1),
        "compile_wall_s": round(compile_wall, 1),
        "overflow_states": overflow,
        "t_beta05_pred_s": round(rel_var / 0.05**2 / rate, 1),
    }


def main() -> None:
    from powersystemsreliabilityassessment_tpu.core import cases
    from powersystemsreliabilityassessment_tpu.core.system import build_system
    from powersystemsreliabilityassessment_tpu.engines import dcopf
    from powersystemsreliabilityassessment_tpu.parallel import mesh as meshlib
    from powersystemsreliabilityassessment_tpu.studies.hl2_nsq import (
        calibrate_ce_proposal, sparsify_ce_proposal)
    from powersystemsreliabilityassessment_tpu.utils.config import (
        CompatFlags, IPMConfig)

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--case", default="case300s",
                    choices=["case300s", "rts96weak"])
    ap.add_argument("--out", default="results/ce_sparse.json")
    args = ap.parse_args()

    if args.case == "rts96weak":
        from probe_ce_ab import weak_tie_case
        case = weak_tie_case()
    else:
        case = getattr(cases, args.case)()
    compat, ipm = CompatFlags(), IPMConfig()
    sys_ = build_system(case, compat)
    mesh = meshlib.scenario_mesh()
    meshlib.warmup_backend()
    hint_arr = dcopf.calibrate_shed_hint(sys_)

    t0 = time.perf_counter()
    q_dense, ce_diag = calibrate_ce_proposal(
        sys_, compat, ipm, batch=32768, rounds=2,
        seed=args.seed + 90210, shed_hint=hint_arr)
    pilot_wall = time.perf_counter() - t0
    if q_dense is None:
        print(json.dumps({"error": "pilot saw no events", "diag": ce_diag}))
        return

    U = np.asarray(sys_.unavail, np.float64)
    ng = sys_.n_gen
    ratio = q_dense / np.maximum(U, 1e-9)
    top = np.argsort(ratio[ng:])[::-1][:16]
    print("top tilt branches:", top.tolist())
    print("  q_hat:", np.round(q_dense[ng:][top], 4).tolist())
    print("  U:    ", np.round(U[ng:][top], 5).tolist(), flush=True)

    arms = {
        "plain": None,
        "sparse_k8_c05": sparsify_ce_proposal(q_dense, sys_, 8, 0.05),
        "sparse_k8_c02": sparsify_ce_proposal(q_dense, sys_, 8, 0.02),
        "sparse_k16_c05": sparsify_ce_proposal(q_dense, sys_, 16, 0.05),
    }
    out = {"case": case.name, "batches": args.batches, "batch": args.batch,
           "seed": args.seed, "backend": jax.default_backend(),
           "pilot_wall_s": round(pilot_wall, 1), "ce_diag": ce_diag,
           "top_branches": top.tolist(), "arms": {}}
    for name, q in arms.items():
        r = run_arm(sys_, mesh, name, q, args.batches, args.batch,
                    args.seed, hint_arr, compat, ipm, max_lp=256)
        if q is not None:
            r["sum_q_minus_u"] = round(float((q - U).sum()), 4)
        out["arms"][name] = r
        print(json.dumps({name: r}), flush=True)

    p = out["arms"]["plain"]
    for name in arms:
        if name == "plain":
            continue
        a = out["arms"][name]
        a["vr_per_sample"] = round(p["rel_var"] / max(a["rel_var"], 1e-9), 2)
        a["vr_equal_wall"] = round(
            a["vr_per_sample"] * a["warm_samples_per_s"]
            / p["warm_samples_per_s"], 2)
        a["speedup_to_beta05"] = round(
            p["t_beta05_pred_s"]
            / max(a["t_beta05_pred_s"] + pilot_wall, 1e-9), 2)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
