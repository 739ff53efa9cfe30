"""Slope-time the fused whole-solve IPM kernel (B=2048, 16 iters).

Relay-noise-proof methodology (see .claude/skills/verify/SKILL.md): run k
complete solves inside ONE dispatch via lax.scan (fresh sampled states
per scan step, so the pooled-TPU result cache cannot short-circuit), and
report the (k=9 - k=1)/8 slope. Also prints lane-quality stats so a
"faster" kernel that silently degrades lanes is caught immediately.

Usage: python scripts/probe_fused_slope.py [--batch 2048] [--reps 5]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import powersystemsreliabilityassessment_tpu  # noqa: F401  (matmul prec)
import jax
import jax.numpy as jnp

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines import (
    dcopf, lp_ipm_structured)
from powersystemsreliabilityassessment_tpu.ops.ipm_fused import (
    build_structure)
from powersystemsreliabilityassessment_tpu.sampling import state as sstate
from powersystemsreliabilityassessment_tpu.models import twostate
from powersystemsreliabilityassessment_tpu.utils.config import (
    CompatFlags, IPMConfig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    case = cases.rts24()
    compat = CompatFlags()
    ipm = IPMConfig()
    sys_ = build_system(case, compat)
    st = build_structure(sys_)
    probs = jnp.asarray(twostate.unavailability(case), jnp.float32)
    B = args.batch
    nd = sys_.n_load
    load_pu = jnp.broadcast_to(sys_.load_pd[None, :], (B, nd))

    def one_solve(key):
        comp_down = sstate.sample_states(
            key, probs, jnp.zeros_like(probs, bool), B)
        up = 1.0 - comp_down.astype(jnp.float32)
        gen_up, br_up = up[:, :sys_.n_gen], up[:, sys_.n_gen:]
        c, b, l, u, colscale = dcopf.build_state_lp_vectors(
            sys_, gen_up, br_up, load_pu, compat, ipm.theta_max)
        sol = lp_ipm_structured.solve_box_lp_structured(
            st, colscale, br_up, c, b, l, u, ipm)
        return (jnp.sum(sol.x) + jnp.sum(sol.primal_residual),
                jnp.max(sol.primal_residual))

    def k_solves(k):
        @jax.jit
        def run(key):
            def body(carry, i):
                s, q = one_solve(jax.random.fold_in(key, i))
                return carry + s, q
            acc, qs = jax.lax.scan(body, 0.0, jnp.arange(k))
            return acc, jnp.max(qs)
        return run

    run1, run9 = k_solves(1), k_solves(9)
    # compile both (fresh keys; materialize to force)
    root = jax.random.key(args.seed)
    t0 = time.time()
    np.asarray(run1(jax.random.fold_in(root, 1000))[0])
    print(f"compile k=1: {time.time() - t0:.1f}s")
    t0 = time.time()
    np.asarray(run9(jax.random.fold_in(root, 2000))[0])
    print(f"compile k=9: {time.time() - t0:.1f}s")

    slopes = []
    for r in range(args.reps):
        t0 = time.time()
        np.asarray(run1(jax.random.fold_in(root, r))[0])
        t1 = time.time() - t0
        t0 = time.time()
        _, q = run9(jax.random.fold_in(root, 100 + r))
        np.asarray(q)
        t9 = time.time() - t0
        slope = (t9 - t1) / 8.0
        slopes.append(slope)
        print(f"rep {r}: k1 {t1 * 1e3:7.1f} ms  k9 {t9 * 1e3:7.1f} ms  "
              f"slope {slope * 1e3:6.2f} ms/solve  max rp {float(q):.2e}")
    s = np.asarray(slopes) * 1e3
    print(f"B={B} iters={ipm.iterations}: slope min {s.min():.2f} "
          f"median {np.median(s):.2f} ms/solve "
          f"({B / (np.median(s) / 1e3):,.0f} LP lanes/s)")


if __name__ == "__main__":
    main()
