"""Characterize the DNS>0 events at case300s: what drives the risk?

The round-3 pilot (results/case300_scaleup_pilot.json) shows gens-scope
importance boost AND the copper-sheet CV both give ~no variance
reduction at case300s, while the cert breakdown shows deficit_pos_frac
= 0 at 8k samples — so the EDNS is NOT capacity-driven. This probe
samples N plain-MC batches, evaluates them, and dumps per-event
anatomy for every DNS>0 lane: generator/branch outage counts, copper
deficit, islanding involvement (island_blackout contribution), and the
certified/LP provenance. The answer picks the rare-event lever for the
converged scale-up run (branch-scope boost vs islanding enumeration vs
bigger plain run).

Usage: python scripts/probe_case300_events.py [--samples 65536]
Writes results/case300_events.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=65536)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--out", default="results/case300_events.json")
    args = ap.parse_args()

    from powersystemsreliabilityassessment_tpu.core import cases
    from powersystemsreliabilityassessment_tpu.core.system import build_system
    from powersystemsreliabilityassessment_tpu.engines import dcopf
    from powersystemsreliabilityassessment_tpu.sampling.state import (
        sample_states)
    from powersystemsreliabilityassessment_tpu.utils.config import (
        CompatFlags, IPMConfig)

    case = cases.case300s()
    compat, ipm = CompatFlags(), IPMConfig()
    sys_ = build_system(case, compat)
    ng = sys_.n_gen
    B = args.batch

    @jax.jit
    def step(key):
        down = sample_states(key, sys_.unavail, sys_.always_up_nsq, B)
        load = jnp.broadcast_to(sys_.load_pd[None, :], (B, sys_.n_load))
        res, n_over = dcopf.evaluate_states_screened(
            sys_, down, load, 128, compat, ipm, "proportional",
            woodbury_k=4)
        cert = dcopf.certify_states(sys_, down, load, woodbury_k=4)
        dns = res.dns_mw
        # copper deficit in MW for the same states
        cop = dcopf.copper_sheet_bound(sys_, down, load)
        return down, dns, cop, cert.certified, res.primal_residual, n_over

    key = jax.random.key(args.seed)
    t0 = time.perf_counter()
    events = []
    tot_dns = 0.0
    n_batches = args.samples // B
    n_over_tot = 0
    for i in range(n_batches):
        down, dns, cop, certified, resq, n_over = jax.device_get(
            step(jax.random.fold_in(key, 1000 + i)))
        n_over_tot += int(n_over)
        sel = np.nonzero(dns > 0)[0]
        tot_dns += float(dns.sum())
        for j in sel:
            events.append({
                "batch": i, "lane": int(j),
                "dns_mw": round(float(dns[j]), 3),
                "copper_deficit_mw": round(float(cop[j]), 3),
                "n_gen_down": int(down[j, :ng].sum()),
                "n_br_down": int(down[j, ng:].sum()),
                "br_down_idx": np.nonzero(down[j, ng:])[0].tolist(),
                "certified": bool(certified[j]),
                "lane_quality": float(resq[j]),
            })
        print(f"batch {i}: events so far {len(events)}", flush=True)
    wall = time.perf_counter() - t0

    n = n_batches * B
    ev_capacity = [e for e in events if e["copper_deficit_mw"] > 0]
    ev_network = [e for e in events if e["copper_deficit_mw"] <= 0]
    out = {
        "case": "case300s", "samples": n, "seed": args.seed,
        "wall_s": round(wall, 1),
        "edns_mw": round(tot_dns / n, 5),
        "n_events": len(events),
        "n_overflow": n_over_tot,
        "n_capacity_driven": len(ev_capacity),
        "n_network_driven": len(ev_network),
        "capacity_dns_share": round(
            sum(e["dns_mw"] for e in ev_capacity) / max(tot_dns, 1e-9), 4),
        "network_dns_share": round(
            sum(e["dns_mw"] for e in ev_network) / max(tot_dns, 1e-9), 4),
        "events": events[:200],
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "events"}))


if __name__ == "__main__":
    main()
