"""Diff a probe_blocked_quality npz against the float64 HiGHS oracle (CPU).

Usage: python scripts/probe_oracle_diff.py <case> <npz> [n_zero_lanes]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linprog

import powersystemsreliabilityassessment_tpu as psra  # noqa: F401
from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines.dcopf import build_state_lp
from powersystemsreliabilityassessment_tpu.utils.config import (
    CompatFlags, IPMConfig)

case_name = sys.argv[1]
if case_name.startswith("rts24x"):
    case = cases.replicate_case(cases.rts24(), int(case_name[6:]))
else:
    case = getattr(cases, case_name)()
sys_ = build_system(case)
ng, nd = int(sys_.n_gen), int(sys_.load_pd.shape[0])
base = float(sys_.base_mva)
compat = CompatFlags()
theta_max = IPMConfig().theta_max
load = jnp.asarray(sys_.load_pd, jnp.float64)

d = np.load(sys.argv[2])
states, dns_tpu = d["states"], d["dns"]
n_zero = int(sys.argv[3]) if len(sys.argv) > 3 else 30


def oracle_dns(down):
    gu = jnp.asarray(1.0 - down[:ng], jnp.float64)
    bu = jnp.asarray(1.0 - down[ng:], jnp.float64)
    c, A, b, l, u = build_state_lp(sys_, gu, bu, load, compat, theta_max)
    r = linprog(np.asarray(c), A_eq=np.asarray(A), b_eq=np.asarray(b),
                bounds=list(zip(np.asarray(l), np.asarray(u))),
                method="highs")
    assert r.status == 0, r.message
    dns = float(np.sum(r.x[ng:ng + nd])) * base
    return 0.0 if dns < compat.dns_noise_floor_mw else dns


idx = list(np.nonzero(dns_tpu > 0)[0])
# Guard-tripped lanes ALWAYS enter the oracle set: a flagged lane is
# degraded to its certificate bound, so it can return 0 while the true
# DNS is large — random zero-lane sampling missed exactly such a lane
# (94.0 MW true shed behind a 0.0269 "max err" headline).
if "q" in d and "certified" in d:
    idx += list(np.nonzero((d["q"] > 5e-3) & ~d["certified"])[0])
rng = np.random.default_rng(1)
zeros = np.nonzero(dns_tpu == 0)[0]
idx += list(rng.choice(zeros, min(n_zero, len(zeros)), replace=False))
idx = list(dict.fromkeys(int(i) for i in idx))
worst = 0.0
for i in idx:
    ref = oracle_dns(states[i].astype(np.float64))
    err = abs(ref - float(dns_tpu[i]))
    worst = max(worst, err)
    if err > 0.05:
        print(f"  lane {i}: tpu {dns_tpu[i]:.3f} vs f64 {ref:.3f} "
              f"(err {err:.3f} MW)")
print(f"{len(idx)} lanes diffed vs HiGHS f64: max |err| = {worst:.4f} MW")
