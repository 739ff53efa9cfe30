"""Probe IPM lane quality through the blocked-Cholesky path on TPU.

Usage: python scripts/probe_blocked_quality.py <case> <crossover> [refine]
  case:      rts96 | rts24x4 | rts24x6
  crossover: value to set _BLOCKED_MAX_M to (224=current, 336=extended,
             0=force XLA)
  refine:    blocked-solve refinement steps (default: module default)

Evaluates 128 deep contingencies (2-4 line + 3-8 gen outages, beyond the
rank-<=2 certificates) via the public dcopf.evaluate_states and reports
the lane-quality score distribution and the fraction of uncertified lanes
tripping the 5e-3 trust guard. Saves per-lane results for oracle diffs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import powersystemsreliabilityassessment_tpu as psra  # noqa: F401
from powersystemsreliabilityassessment_tpu.engines import lp_ipm_batched
from powersystemsreliabilityassessment_tpu.ops import blocked_chol

case_name = sys.argv[1]
lp_ipm_batched._BLOCKED_MAX_M = int(sys.argv[2])
if len(sys.argv) > 3:
    blocked_chol.REFINE_STEPS = int(sys.argv[3])
if len(sys.argv) > 4:
    blocked_chol.LIFT = float(sys.argv[4])

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines import dcopf

if case_name.startswith("rts24x"):
    case = cases.replicate_case(cases.rts24(), int(case_name[6:]))
else:
    case = getattr(cases, case_name)()
sys_ = build_system(case)
ng, nl = int(sys_.n_gen), int(sys_.n_branch)
m = int(sys_.n_bus) + nl
rng = np.random.default_rng(5)

B = 128
states = np.zeros((B, ng + nl), np.float32)
for i in range(B):
    for j in rng.choice(nl, rng.integers(2, 5), replace=False):
        states[i, ng + j] = 1.0
    for j in rng.choice(ng, rng.integers(3, 9), replace=False):
        states[i, j] = 1.0

load_pu = jnp.broadcast_to(jnp.asarray(sys_.load_pd),
                           (B, int(sys_.load_pd.shape[0])))
res = dcopf.evaluate_states(sys_, jnp.asarray(states), load_pu)
dns = np.asarray(res.dns_mw)
q = np.asarray(res.primal_residual)
cert = np.asarray(dcopf.certify_states(sys_, jnp.asarray(states),
                                       load_pu).certified)
uncert = ~cert
tag = f"{case_name} m={m} xover={sys.argv[2]} ref={blocked_chol.REFINE_STEPS}"
print(f"[{tag}] certified {cert.sum()}/{B}; guard-tripped uncertified: "
      f"{int(((q > 5e-3) & uncert).sum())}/{int(uncert.sum())}; "
      f"quality median {np.median(q):.2e} max {q.max():.2e}; "
      f"shed lanes {(dns > 0).sum()} total {dns.sum():.2f} MW")
np.savez(f"/tmp/probe_quality_{case_name}_{sys.argv[2]}.npz",
         states=states, dns=dns, q=q, certified=cert)

# Wall-clock over fresh inputs (the relay caches repeated (exe, input)
# pairs — never reuse a batch).
import time

times = []
for rep in range(5):
    st = np.zeros((B, ng + nl), np.float32)
    for i in range(B):
        for j in rng.choice(nl, rng.integers(2, 5), replace=False):
            st[i, ng + j] = 1.0
        for j in rng.choice(ng, rng.integers(3, 9), replace=False):
            st[i, j] = 1.0
    t0 = time.time()
    jax.block_until_ready(
        dcopf.evaluate_states(sys_, jnp.asarray(st), load_pu))
    times.append(time.time() - t0)
print(f"[{tag}] eval wall per 128-batch: min {min(times)*1e3:.1f} ms "
      f"median {sorted(times)[2]*1e3:.1f} ms")
