"""Round-4 A/B: cross-entropy network-aware importance sampling vs
plain MC in the two NETWORK-DRIVEN regimes where every earlier
variance-reduction tool failed (round-3 VERDICT item 2).

Cases:
  case300s     deficit events 100% network-driven (capacity_dns_share 0,
               results/case300_events.json); copper CV + uniform boosts
               are provably blind here (boost2 made beta WORSE).
  rts96weak    RTS-96 with the five inter-area tie ratings halved (the
               knob the CRN sweep showed matters) — the engineered
               transmission-driven config splitting failed on
               (results/split_niche.json).

Arms (NSQ peak load, same batch size, same seeds per arm):
  plain        reference sampler (mc_sampling.m equivalent)
  ce           calibrate_ce_proposal pilot -> per-component tilt with
               exact likelihood ratios (studies/hl2_nsq.py)

Metrics per arm, from K batches x B samples:
  edns_mw          point estimate (must agree across arms ~ 2 sigma)
  rel_var          per-sample relative variance n*E[x^2]/E[x]^2 - 1 of
                   the EDNS estimator (x = w*f) — the quantity beta^2*n
                   converges to; the A/B headline is the ratio.
  warm rate        samples/s excluding compile (first batch timed apart)
  t_beta05_s       predicted wall to beta=0.05 at the warm rate
                   (rel_var / beta^2 / rate [+ pilot wall for ce])

Timing hygiene per CLAUDE.md: fresh fold_in keys per batch, min-free
accounting (wall over all K warm batches), block_until_ready.

Usage: python scripts/probe_ce_ab.py [--batches 32] [--out results/ce_ab.json]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import powersystemsreliabilityassessment_tpu as psra  # noqa: F401
import jax

N_TIES = 5


def weak_tie_case(rate_scale: float = 0.5):
    from powersystemsreliabilityassessment_tpu.core import cases
    c = cases.rts96()
    br_rate = c.br_rate.copy()
    br_rate[-N_TIES:] *= rate_scale
    return dataclasses.replace(c, name="rts96weak", br_rate=br_rate)


def run_arm(case, arm: str, batches: int, batch: int, seed: int,
            ce_batch: int = 32768) -> dict:
    from powersystemsreliabilityassessment_tpu.core.system import build_system
    from powersystemsreliabilityassessment_tpu.engines import dcopf
    from powersystemsreliabilityassessment_tpu.parallel import mesh as meshlib
    from powersystemsreliabilityassessment_tpu.studies.hl2_nsq import (
        calibrate_ce_proposal, make_nsq_batch_step)
    from powersystemsreliabilityassessment_tpu.utils.config import (
        CompatFlags, IPMConfig)

    compat, ipm = CompatFlags(), IPMConfig()
    sys_ = build_system(case, compat)
    mesh = meshlib.scenario_mesh()
    meshlib.warmup_backend()
    n_dev = mesh.devices.size
    bpd = max(batch // n_dev, 1)

    hint = dcopf.calibrate_shed_hint(sys_)

    pilot_wall = 0.0
    is_q, ce_diag = None, None
    if arm == "ce":
        t0 = time.perf_counter()
        is_q, ce_diag = calibrate_ce_proposal(
            sys_, compat, ipm, batch=ce_batch, rounds=2,
            seed=seed + 90210, shed_hint=hint)
        pilot_wall = time.perf_counter() - t0
        if is_q is None:
            return {"arm": arm, "error": "CE pilot saw no events",
                    "diag": ce_diag}
        frac = ce_diag["rounds"][-1]["events"] / ce_batch
        need = int(1.5 * frac * bpd) + 64
        max_lp = min(bpd, ((need + 127) // 128) * 128)
    else:
        max_lp = None

    step = make_nsq_batch_step(sys_, mesh, bpd, compat, ipm,
                               max_lp=max_lp, nodal_mode="proportional",
                               shed_hint=hint, is_q=is_q)
    root = jax.random.key(seed)

    # Compile + admission on batch 0 (timed separately; grow-and-redo on
    # overflow keeps the estimate exact, mirroring run_nsq_study).
    t0 = time.perf_counter()
    out0 = step(jax.random.fold_in(root, 0))
    jax.block_until_ready(out0)
    compile_wall = time.perf_counter() - t0
    if int(out0[1]) > 0 and is_q is not None:
        max_lp = min(bpd, 2 * max_lp)
        step = make_nsq_batch_step(sys_, mesh, bpd, compat, ipm,
                                   max_lp=max_lp,
                                   nodal_mode="proportional",
                                   shed_hint=hint, is_q=is_q)
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
    pending = [step(jax.random.fold_in(root, i))
               for i in range(1, batches)]
    for out in pending:
        jax.block_until_ready(out)
        fold(out)
    warm_wall = time.perf_counter() - t0

    n = S["n"]
    mean = S["f"] / n
    rel_var = n * S["f2"] / max(S["f"] ** 2, 1e-30) - 1.0
    rate = (n - batch) / warm_wall
    beta_target = 0.05
    t_beta = rel_var / beta_target**2 / rate + pilot_wall
    res = {
        "arm": arm, "batches": batches, "batch": batch, "n": int(n),
        "max_lp": max_lp, "edns_mw": round(mean, 5),
        "edns_se_mw": round(mean * np.sqrt(max(rel_var, 0.0) / n), 5),
        "plc_weighted": round(S["flag"] / n, 7),
        "rel_var": round(rel_var, 1),
        "warm_samples_per_s": round(rate, 1),
        "warm_wall_s": round(warm_wall, 2),
        "compile_wall_s": round(compile_wall, 1),
        "pilot_wall_s": round(pilot_wall, 1),
        "overflow_states": overflow,
        "t_beta05_pred_s": round(t_beta, 1),
    }
    if ce_diag is not None:
        res["ce_diag"] = ce_diag
    return res


def main() -> None:
    from powersystemsreliabilityassessment_tpu.core import cases

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--case", default=None,
                    choices=[None, "case300s", "rts96weak"],
                    help="run one case only (one process per case "
                         "isolates relay flakes); result accumulates")
    ap.add_argument("--arm", default=None, choices=[None, "plain", "ce"])
    ap.add_argument("--ce-batch", type=int, default=32768)
    ap.add_argument("--out", default="results/ce_ab.json")
    args = ap.parse_args()

    out = {"batches": args.batches, "batch": args.batch,
           "seed": args.seed, "backend": jax.default_backend(),
           "cases": {}}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)

    case_objs = {"case300s": cases.case300s, "rts96weak": weak_tie_case}
    for cname, cfn in case_objs.items():
        if args.case and cname != args.case:
            continue
        c = cfn()
        centry = out["cases"].setdefault(cname, {})
        for arm in ("plain", "ce"):
            if args.arm and arm != args.arm:
                continue
            r = run_arm(c, arm, args.batches, args.batch, args.seed,
                        ce_batch=args.ce_batch)
            centry[arm] = r
            print(json.dumps({cname: {arm: r}}), flush=True)
        if "plain" in centry and "ce" in centry and \
                "rel_var" in centry["ce"]:
            p, ce = centry["plain"], centry["ce"]
            centry["vr_per_sample"] = round(
                p["rel_var"] / max(ce["rel_var"], 1e-9), 1)
            centry["vr_equal_wall"] = round(
                centry["vr_per_sample"]
                * ce["warm_samples_per_s"] / p["warm_samples_per_s"], 1)
            centry["speedup_to_beta05"] = round(
                p["t_beta05_pred_s"] / max(ce["t_beta05_pred_s"], 1e-9),
                1)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
