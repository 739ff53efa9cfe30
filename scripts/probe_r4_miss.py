"""Round-4 probe: what ARE the current certificate misses at case300s?

With woodbury_k=4 + calibrated shed hint the screened step still routes
~48 of 8192 lanes to the m=792 LP (results/case300_step_profile.json).
Round-3's breakdown (results/case300_cert_breakdown.json, woodbury_k=2
era) showed every ORACLED ineligible miss was a benign zero-shed state
— if that still holds, a tier-1.5 certificate (exact reduced-network PF
check on the compacted miss buffer) can close them and max_lp can
shrink 2-4x. This probe characterizes the current miss class:

  * n_out (branch outages) histogram of miss lanes
  * copper deficit > 0 fraction
  * islanding fraction (any load/gen bus disconnected from the
    reference island, via dcopf.connected_to_ref on the miss buffer)
  * LP DNS of every miss lane (current production LP), plus f64 HiGHS
    oracle on up to --oracle lanes (separate CPU process).

Usage: python scripts/probe_r4_miss.py [--batches 8] [--out results/r4_miss.json]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--oracle", type=int, default=48)
    ap.add_argument("--out", default="results/r4_miss.json")
    args = ap.parse_args()

    case = cases.case300s()
    sys_ = build_system(case)
    B = args.batch
    ng, nl = sys_.n_gen, sys_.n_branch
    hint = dcopf.calibrate_shed_hint(sys_)
    hint_j = None if hint is None else jnp.asarray(hint, jnp.float32)
    rb = dcopf.default_repair_buffer(B, hinted=hint is not None)
    wk = 4
    load = jnp.broadcast_to(sys_.load_pd[None, :], (B, sys_.n_load))

    @jax.jit
    def miss_of(key):
        down = sample_states(key, sys_.unavail, sys_.always_up_nsq, B)
        cert = dcopf.certify_states(
            sys_, down, load,
            shed_hint=None if hint_j is None else jnp.broadcast_to(
                hint_j[None, :], load.shape),
            repair_buffer=rb, woodbury_k=wk)
        return down, cert.certified, cert.deficit

    miss_states, miss_deficit = [], []
    for r in range(args.batches):
        down, cert, deficit = miss_of(jax.random.key(1234 + r))
        down = np.asarray(down)
        missm = ~np.asarray(cert)
        miss_states.append(down[missm])
        miss_deficit.append(np.asarray(deficit)[missm])
        print(f"batch {r}: {int(missm.sum())} misses", flush=True)
    miss_states = np.concatenate(miss_states)
    miss_deficit = np.concatenate(miss_deficit)
    n_miss = len(miss_states)

    br_down = miss_states[:, ng:ng + nl]
    n_out = br_down.sum(axis=1).astype(int)
    hist = {str(k): int((n_out == k).sum()) for k in
            sorted(set(n_out.tolist()))}

    # Islanding: any bus outside the reference island.
    br_up = jnp.asarray(1.0 - br_down, jnp.float32)
    reach = np.asarray(dcopf.connected_to_ref(sys_, br_up))
    islanded = ~reach.all(axis=1)

    # Tier-1.5 closure: how many misses does the island-PF certificate
    # certify, and at what cost?
    import time
    pf_pad = (-n_miss) % 128
    pf_states = np.concatenate(
        [miss_states, np.zeros((pf_pad, miss_states.shape[1]), np.float32)])
    load_pf = jnp.broadcast_to(sys_.load_pd[None, :],
                               (len(pf_states), sys_.n_load))
    pf_fn = jax.jit(lambda st: dcopf.certify_island_pf(sys_, st, load_pf))
    t0 = time.perf_counter()
    pf = pf_fn(jnp.asarray(pf_states))
    jax.block_until_ready(pf)
    pf_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(pf_fn(jnp.asarray(pf_states)))
    pf_warm_s = time.perf_counter() - t0
    pf_cert = np.asarray(pf.certified)[:n_miss]
    pf_deficit = np.asarray(pf.deficit)[:n_miss]

    # LP DNS of every miss lane through the current production path.
    compat, ipm = CompatFlags(), IPMConfig()
    pad = (-n_miss) % 128
    ms = np.concatenate([miss_states,
                         np.zeros((pad, miss_states.shape[1]), np.float32)])
    loadm = jnp.broadcast_to(sys_.load_pd[None, :],
                             (len(ms), sys_.n_load))
    res = dcopf.evaluate_states(sys_, jnp.asarray(ms), loadm, compat, ipm,
                                wk)
    dns = np.asarray(res.dns_mw)[:n_miss]

    out = {
        "case": case.name, "batch": B, "batches": args.batches,
        "woodbury_k": wk, "repair_buffer": rb,
        "n_miss": n_miss, "miss_frac": n_miss / (B * args.batches),
        "n_out_hist": hist,
        "deficit_pos": int((miss_deficit > 0).sum()),
        "islanded": int(islanded.sum()),
        "islanded_and_nout_le4": int((islanded & (n_out <= 4)).sum()),
        "lp_dns_pos": int((dns > 0).sum()),
        "lp_dns_max_mw": float(dns.max()) if n_miss else 0.0,
        "lp_dns_pos_islanded": int(((dns > 0) & islanded).sum()),
        "lp_dns_pos_nout_hist": {
            str(k): int(((dns > 0) & (n_out == k)).sum())
            for k in sorted(set(n_out[dns > 0].tolist()))} if
        (dns > 0).any() else {},
        "pf_certified": int(pf_cert.sum()),
        "pf_certified_frac": float(pf_cert.mean()) if n_miss else 0.0,
        "pf_sound_max_gap_mw": float(np.abs(
            np.where(pf_cert, pf_deficit * float(sys_.base_mva) - dns,
                     0.0)).max()) if n_miss else 0.0,
        "pf_miss_after": int((~pf_cert).sum()),
        "pf_compile_s": round(pf_compile_s, 1),
        "pf_warm_s_at_buf": round(pf_warm_s, 4),
        "pf_buf": len(pf_states),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out, indent=1), flush=True)

    # f64 oracle on a subset (separate CPU process; TPU has no f64).
    if args.oracle and n_miss:
        rng = np.random.default_rng(0)
        pick = rng.choice(n_miss, min(args.oracle, n_miss), replace=False)
        # prioritize: all dns>0 lanes + all islanded, fill with random
        prio = np.unique(np.concatenate(
            [np.nonzero(dns > 0)[0], np.nonzero(islanded)[0], pick]))
        prio = prio[:max(args.oracle, len(np.nonzero(dns > 0)[0]))]
        with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
            np.savez(f, states=miss_states[prio], dns=dns[prio])
            npz = f.name
        r = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "probe_oracle_diff.py"),
             "case300s", npz, "9999"],
            capture_output=True, text=True, timeout=3600)
        print(r.stdout[-3000:], r.stderr[-2000:], flush=True)
        out["oracle_tail"] = r.stdout.strip().splitlines()[-3:]
        os.unlink(npz)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
