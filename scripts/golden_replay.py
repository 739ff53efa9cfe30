"""float64-on-CPU golden replay (regression gate for the LP/DC-OPF path).

Replays a FIXED, seeded state set through the CPU evaluator and checks two
things:

  1. **Oracle agreement** — every lane's DNS against an independent
     float64 ``scipy.optimize.linprog(method="highs")`` solve of the same
     LP (the canonical oracle of ``tests/test_lp_dcopf.py``);
  2. **Replay stability** — the full DNS vector against the committed
     golden file ``tests/golden/golden_replay.json``. Any change to the LP
     path (solver iterations, certificates, conditioning tricks) that
     moves a state's answer shows up as a diff here, state-by-state,
     before it can bias a Monte Carlo study.

Usage:
    python scripts/golden_replay.py            # verify (exit 1 on drift)
    python scripts/golden_replay.py --update   # regenerate the golden file

The reference has no analog — its regression baselines are committed
end-of-run artifacts only (SURVEY.md §4 item 4); this gives per-state
coverage at ~1 s cost.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

# Force the CPU backend BEFORE any jax import paths initialize a backend
# (this container's sitecustomize registers the TPU plugin at startup;
# jax.config.update still wins because backends initialize lazily).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from scipy.optimize import linprog  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from powersystemsreliabilityassessment_tpu.core import cases  # noqa: E402
from powersystemsreliabilityassessment_tpu.core.system import build_system  # noqa: E402
from powersystemsreliabilityassessment_tpu.engines import dcopf  # noqa: E402
from powersystemsreliabilityassessment_tpu.models import twostate  # noqa: E402
from powersystemsreliabilityassessment_tpu.utils.config import (  # noqa: E402
    CompatFlags, IPMConfig)

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden", "golden_replay.json")
ORACLE_TOL_MW = 0.05   # |DNS - f64 oracle| per lane
REPLAY_TOL_MW = 0.02   # |DNS - committed golden| per lane


def build_state_set(case, sys):
    """Deterministic replay set: stressed random states, every N-1 branch
    outage, random N-2 pairs, and off-peak hours."""
    rng = np.random.default_rng(2024)
    u = twostate.unavailability(case)
    nc, nl, ng = case.n_comp, case.n_branch, case.n_gen
    peak = np.asarray(sys.load_pd, np.float64)

    downs, loads, tags = [], [], []
    # 40 stressed random states at peak (3x unavailability -> deficits).
    st = rng.uniform(size=(40, nc)) < 3 * u[None, :]
    st[:, 14] = False
    for i, s in enumerate(st):
        downs.append(s); loads.append(peak); tags.append(f"stress{i}")
    # Every single-branch outage at peak.
    for k in range(nl):
        s = np.zeros(nc, bool); s[ng + k] = True
        downs.append(s); loads.append(peak); tags.append(f"N-1 line{k}")
    # 12 random branch pairs at peak.
    for i in range(12):
        k1, k2 = rng.choice(nl, 2, replace=False)
        s = np.zeros(nc, bool); s[ng + k1] = True; s[ng + k2] = True
        downs.append(s); loads.append(peak); tags.append(f"N-2 l{k1}+l{k2}")
    # 8 stressed states at 60% load (SEQ-style off-peak hour).
    st2 = rng.uniform(size=(8, nc)) < 3 * u[None, :]
    st2[:, 14] = False
    for i, s in enumerate(st2):
        downs.append(s); loads.append(0.6 * peak); tags.append(f"offpeak{i}")
    return np.asarray(downs), np.asarray(loads), tags


def oracle_dns(sys, down, load_pu, compat, ipm):
    """float64 linprog(HiGHS) solve of the identical LP, in MW."""
    ng = sys.n_gen
    gu = jnp.asarray(1.0 - down[:ng].astype(np.float64))
    bu = jnp.asarray(1.0 - down[ng:].astype(np.float64))
    c, A, b, l, u = dcopf.build_state_lp(sys, gu, bu, jnp.asarray(load_pu),
                                         compat, ipm.theta_max)
    r = linprog(np.asarray(c, np.float64), A_eq=np.asarray(A, np.float64),
                b_eq=np.asarray(b, np.float64),
                bounds=list(zip(np.asarray(l, np.float64),
                                np.asarray(u, np.float64))), method="highs")
    assert r.status == 0, r.message
    dns = r.fun * sys.base_mva
    return 0.0 if dns < compat.dns_noise_floor_mw else dns


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true",
                    help="regenerate the committed golden file")
    args = ap.parse_args()

    compat, ipm = CompatFlags(), IPMConfig()
    case = cases.rts24()
    sys_ = build_system(case, compat)
    downs, loads, tags = build_state_set(case, sys_)

    res = dcopf.evaluate_states(sys_, jnp.asarray(downs), jnp.asarray(loads),
                                compat, ipm)
    dns = np.asarray(res.dns_mw, np.float64)

    # 1) oracle agreement, every lane
    worst, n_bad = 0.0, 0
    for i in range(len(tags)):
        ref = oracle_dns(sys_, downs[i], loads[i], compat, ipm)
        err = abs(dns[i] - ref)
        worst = max(worst, err)
        if err > ORACLE_TOL_MW:
            n_bad += 1
            print(f"ORACLE MISMATCH {tags[i]}: dns={dns[i]:.4f} "
                  f"oracle={ref:.4f} (|err|={err:.4f} MW)")
    print(f"oracle check: {len(tags)} lanes, worst |err| = {worst:.5f} MW")

    # 2) replay vs committed golden
    if args.update:
        with open(GOLDEN, "w") as f:
            json.dump({"case": case.name, "seed": 2024, "tags": tags,
                       "dns_mw": [round(float(d), 6) for d in dns]}, f,
                      indent=1)
        print(f"golden file updated: {GOLDEN}")
        return 0 if n_bad == 0 else 1

    if not os.path.exists(GOLDEN):
        print(f"no golden file at {GOLDEN}; run with --update first")
        return 1
    with open(GOLDEN) as f:
        g = json.load(f)
    ref = np.asarray(g["dns_mw"], np.float64)
    if len(ref) != len(dns):
        print(f"golden length {len(ref)} != replay length {len(dns)}")
        return 1
    drift = np.abs(dns - ref)
    for i in np.nonzero(drift > REPLAY_TOL_MW)[0]:
        print(f"REPLAY DRIFT {g['tags'][i]}: dns={dns[i]:.4f} "
              f"golden={ref[i]:.4f}")
    print(f"replay check: worst drift = {drift.max():.5f} MW")
    ok = n_bad == 0 and bool((drift <= REPLAY_TOL_MW).all())
    print("golden replay:", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
