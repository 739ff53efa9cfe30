"""Decompose WHY case300s lanes miss the tier-1 certificate (round-3 #1).

At `cases.case300s` peak the certificate screen closed only ~62% of
lanes (38% LP-routed at 125 samples/s). This probe categorizes the
misses on a large sampled batch:

  A. eligibility:   branch-outage depth n_out = 0 / 1 / 2 / >=3
  B. deficit:       copper deficit > 0 fraction
  C. first check:   post-outage flow check pass rate (repair_iters=0)
  D. repair sweep:  pass rate vs repair_iters in {3, 6, 10, 16}
  E. overload anatomy of surviving misses: which branch classes congest
     (in-area 0..455, area-hub links 456..479, backbone ring 480..491)
     and by how much
  F. ground truth on a subsample of misses: f64 HiGHS DNS vs copper
     bound — separates "repair failure" (LP == copper bound: the
     certificate COULD have closed it) from "genuinely network-limited"
     (LP > bound: no copper-bound certificate can ever close it).

Usage: python scripts/probe_case300_cert.py [--batch 8192] [--oracle 24]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def oracle_dns(sys_, down_row: np.ndarray, load_row: np.ndarray) -> float:
    """f64 HiGHS DNS (MW) for one state (same LP as build_state_lp)."""
    from scipy.optimize import linprog

    from powersystemsreliabilityassessment_tpu.engines import dcopf
    from powersystemsreliabilityassessment_tpu.utils.config import (
        CompatFlags, IPMConfig)
    import jax.numpy as jnp

    ng, nl = sys_.n_gen, sys_.n_branch
    up = 1.0 - down_row.astype(np.float32)
    c, A, b, l, u = dcopf.build_state_lp(
        sys_, jnp.asarray(up[:ng]), jnp.asarray(up[ng:ng + nl]),
        jnp.asarray(load_row), CompatFlags(), IPMConfig().theta_max)
    r = linprog(np.asarray(c, np.float64), A_eq=np.asarray(A, np.float64),
                b_eq=np.asarray(b, np.float64),
                bounds=list(zip(np.asarray(l, np.float64),
                                np.asarray(u, np.float64))), method="highs")
    assert r.status == 0, r.message
    return float(r.fun) * float(sys_.base_mva)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--oracle", type=int, default=24,
                    help="miss lanes to ground-truth with f64 HiGHS")
    ap.add_argument("--out", default="results/case300_cert_breakdown.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from powersystemsreliabilityassessment_tpu.core import cases
    from powersystemsreliabilityassessment_tpu.core.system import build_system
    from powersystemsreliabilityassessment_tpu.engines import dcopf
    from powersystemsreliabilityassessment_tpu.parallel import mesh as meshlib
    from powersystemsreliabilityassessment_tpu.sampling.state import (
        sample_states)
    from powersystemsreliabilityassessment_tpu.utils.config import CompatFlags

    compat = CompatFlags()
    case = cases.case300s()
    sys_ = build_system(case, compat)
    B = args.batch
    meshlib.warmup_backend()

    key = jax.random.key(args.seed)
    down = sample_states(key, sys_.unavail, sys_.always_up_nsq, B)
    load = jnp.broadcast_to(sys_.load_pd[None, :], (B, sys_.n_load))

    ng = sys_.n_gen
    down_np = np.asarray(down)
    n_out = down_np[:, ng:].sum(axis=1)
    out = {"case": case.name, "batch": B, "seed": args.seed}
    out["n_out_hist"] = {str(k): int(np.sum(n_out == k)) for k in range(4)}
    out["n_out_ge3"] = int(np.sum(n_out >= 3))

    # copper deficit
    gen_up = 1.0 - down_np[:, :ng].astype(np.float64)
    cap = gen_up @ np.asarray(sys_.gen_pmax, np.float64)
    load_tot = float(np.sum(np.asarray(sys_.load_pd, np.float64)))
    deficit = np.maximum(load_tot - cap, 0.0)
    out["deficit_pos_frac"] = float(np.mean(deficit > 0))

    # certificate sweep over repair_iters
    results = {}
    cert_masks = {}
    for ri in [0, 3, 6, 10, 16]:
        fn = jax.jit(lambda d, ld, ri=ri: dcopf.certify_states(
            sys_, d, ld, repair_iters=ri))
        t0 = time.perf_counter()
        cert = fn(down, load)
        jax.block_until_ready(cert.certified)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        cert = fn(down, load)
        jax.block_until_ready(cert.certified)
        t_warm = time.perf_counter() - t0
        cm = np.asarray(cert.certified)
        cert_masks[ri] = cm
        results[str(ri)] = {
            "certified_frac": round(float(np.mean(cm)), 5),
            "warm_ms": round(1e3 * t_warm, 1),
            "compile_s": round(t_compile, 1),
        }
        print(f"repair_iters={ri:2d}: certified {np.mean(cm):.4f} "
              f"warm {1e3*t_warm:.1f} ms", flush=True)
    out["repair_sweep"] = results

    # anatomy of the misses at the max repair depth
    ri_max = 16
    miss = ~cert_masks[ri_max]
    eligible = n_out <= 2
    out["miss_frac"] = float(np.mean(miss))
    out["miss_ineligible_frac"] = float(np.mean(miss & ~eligible))
    out["miss_eligible_frac"] = float(np.mean(miss & eligible))
    out["miss_eligible_deficit0_frac"] = float(
        np.mean(miss & eligible & (deficit <= 0)))
    out["miss_eligible_deficitpos_frac"] = float(
        np.mean(miss & eligible & (deficit > 0)))
    # outage depth of eligible misses
    for k in [0, 1, 2]:
        out[f"miss_elig_nout{k}"] = int(np.sum(miss & eligible & (n_out == k)))
    # gen outage count on eligible deficit-0 misses vs certified
    gdown = down_np[:, :ng].sum(axis=1)
    out["gdown_mean_all"] = float(np.mean(gdown))
    m0 = miss & eligible
    out["gdown_mean_miss_elig"] = float(np.mean(gdown[m0])) if m0.any() else 0

    # which lines overload for the first candidate on the missing lanes
    cert0 = jax.jit(lambda d, ld: dcopf.certify_states(
        sys_, d, ld, repair_iters=0))(down, load)
    # rebuild candidate flows on host f64 for the miss lanes
    sel = np.nonzero(m0)[0][:4096]
    if sel.size:
        shed = np.asarray(cert0.shed, np.float64)[sel]
        disp = np.asarray(cert0.dispatch, np.float64)[sel]
        lodf = np.asarray(sys_.lodf, np.float64)
        ptdf = np.asarray(sys_.ptdf, np.float64)
        cg = np.asarray(sys_.gen_bus_onehot, np.float64)
        cd = np.asarray(sys_.load_onehot, np.float64)
        lp = np.asarray(load, np.float64)[sel]
        inj = disp @ cg.T + shed @ cd.T - lp @ cd.T
        f = inj @ ptdf.T
        brd = down_np[sel, ng:].astype(np.float64)
        post = (f + (brd * f) @ lodf.T) * (1.0 - brd)
        rate = np.asarray(sys_.br_rate, np.float64)
        over = np.maximum(np.abs(post) - rate[None, :], 0.0)
        classes = {"in_area": slice(0, 456), "hub_link": slice(456, 480),
                   "ring": slice(480, 492)}
        anat = {}
        for name, sl in classes.items():
            o = over[:, sl]
            anat[name] = {
                "lanes_with_overload_frac": float(np.mean(o.max(axis=1) > 1e-4)),
                "max_over_pu": float(o.max()),
                "mean_over_pu_when_pos": float(o[o > 1e-4].mean()) if (o > 1e-4).any() else 0.0,
            }
        out["first_candidate_overload_anatomy"] = anat
        # how many overloaded lines per missing lane
        nover = (over > 1e-4).sum(axis=1)
        out["overloaded_lines_per_miss_lane"] = {
            "mean": float(nover.mean()), "p50": int(np.median(nover)),
            "max": int(nover.max())}

    # f64 ground truth on a subsample of (max-repair) misses
    o_n = min(args.oracle, int(m0.sum()))
    rng = np.random.default_rng(0)
    osel = rng.choice(np.nonzero(m0)[0], size=o_n, replace=False)
    truths = []
    t0 = time.perf_counter()
    for i in osel:
        dns = oracle_dns(sys_, down_np[i], np.asarray(load)[i])
        truths.append({
            "lane": int(i), "n_out": int(n_out[i]),
            "deficit_mw": round(float(deficit[i] * sys_.base_mva), 4),
            "lp_dns_mw": round(dns, 4),
            "gap_mw": round(dns - float(deficit[i] * sys_.base_mva), 4)})
    out["oracle_secs"] = round(time.perf_counter() - t0, 1)
    out["oracle"] = truths
    gaps = np.array([t["gap_mw"] for t in truths]) if truths else np.array([0.])
    out["oracle_repairable_frac"] = float(np.mean(gaps <= 1e-3))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "oracle"},
                     indent=1))


if __name__ == "__main__":
    main()
