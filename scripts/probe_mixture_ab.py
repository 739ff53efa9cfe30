"""Round-5: defensive-mixture area-gen importance sampling A/B at
case300s — the proposal family the measured event anatomy actually
calls for.

Why this might work where every product tilt failed (NEXT.md #19):
results/case300_events.json shows every deficit event is an
AREA-CONCENTRATION anomaly — a normal-count outage draw whose gen
outages cluster in one of the 12 symmetric areas past the ring import
(54% of DNS^2 mass has ZERO branch outages). A product tilt cannot say
"one area collapses, I don't know which"; a mixture over 12 per-area
gen tilts + a defensive plain component can, with every likelihood
weight bounded by 1/alpha0 (degeneracy impossible) and NO pilot
(the ring is symmetric — uniform area weights are principled).

The open question is throughput: every deficit event IS a tier-1 miss
(deliverability-limited), so oversampling events by M multiplies LP
lanes by ~M. The A/B measures whether the per-sample variance win
clears that cost (the bar every prior scheme failed).

Arms: plain, mix at boost 2 / 3 (alpha0 0.5, K=12 areas).
Metrics per arm as probe_ce_ab.py: per-sample rel-var of the EDNS
estimator, warm samples/s, predicted time-to-beta=0.05.

Usage: python scripts/probe_mixture_ab.py [--out results/mixture_ab.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import powersystemsreliabilityassessment_tpu  # noqa: F401
import jax


def run_arm(sys_, mesh, name, mix, batches, batch, seed, hint, compat,
            ipm) -> dict:
    from powersystemsreliabilityassessment_tpu.studies.hl2_nsq import (
        make_nsq_batch_step)

    bpd = max(batch // mesh.devices.size, 1)
    step = make_nsq_batch_step(sys_, mesh, bpd, compat, ipm,
                               nodal_mode="proportional",
                               shed_hint=hint, mix=mix)
    root = jax.random.key(seed)
    t0 = time.perf_counter()
    out0 = step(jax.random.fold_in(root, 0))
    jax.block_until_ready(out0)
    compile_wall = time.perf_counter() - t0

    S = {"n": 0.0, "f": 0.0, "f2": 0.0, "flag": 0.0}
    overflow = int(out0[1])

    def fold(out):
        nonlocal overflow
        m = out[0]
        S["n"] += float(m.n)
        S["f"] += float(m.sum_dns)
        S["f2"] += float(m.sum_dns_sq)
        S["flag"] += float(m.sum_flag_raw)

    fold(out0)
    t0 = time.perf_counter()
    pending = [step(jax.random.fold_in(root, i)) for i in range(1, batches)]
    for out in pending:
        jax.block_until_ready(out)
        fold(out)
        overflow += int(out[1])
    warm_wall = time.perf_counter() - t0

    n = S["n"]
    mean = S["f"] / n
    rel_var = n * S["f2"] / max(S["f"] ** 2, 1e-30) - 1.0
    rate = (n - batch) / warm_wall
    return {
        "arm": name, "n": int(n),
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
        gen_area_masks)
    from powersystemsreliabilityassessment_tpu.utils.config import (
        CompatFlags, IPMConfig)

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="results/mixture_ab.json")
    args = ap.parse_args()

    case = cases.case300s()
    compat, ipm = CompatFlags(), IPMConfig()
    sys_ = build_system(case, compat)
    mesh = meshlib.scenario_mesh()
    meshlib.warmup_backend()
    hint = dcopf.calibrate_shed_hint(sys_)
    masks = gen_area_masks(case)
    assert masks is not None and masks.shape[0] == 12

    arms = {
        "plain": None,
        "mix_b2": (masks, 2.0, 0.5),
        "mix_b3": (masks, 3.0, 0.5),
    }
    out = {"case": case.name, "batches": args.batches, "batch": args.batch,
           "seed": args.seed, "backend": jax.default_backend(),
           "n_areas": int(masks.shape[0]), "arms": {}}
    for name, mix in arms.items():
        r = run_arm(sys_, mesh, name, mix, args.batches, args.batch,
                    args.seed, hint, compat, ipm)
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
            p["t_beta05_pred_s"] / max(a["t_beta05_pred_s"], 1e-9), 2)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
