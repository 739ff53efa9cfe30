"""Measure the splitting study's unbiasedness + variance reduction.

Rare-event configuration: the RTS-79 load profile scaled down (default
0.8) makes capacity deficits rare (plain-MC CoV per year blows up).

Modes:

  --calibrate      Sampler-only pass: distribution of each year's MINIMUM
                   copper margin (capacity - load, MW). Pick the splitting
                   level at the ~5-20% yearly-entry quantile.
  default          Two arms at equal years, --seeds independent seeds
                   each: plain (level=-inf: exactly the plain estimator on
                   the same sampler) vs split. Reports per-seed EENS, the
                   across-seed mean +- sem (unbiasedness check: the means
                   must agree within noise), pooled per-year variance, and
                   the variance x wall-clock efficiency ratio.

Usage: python scripts/probe_split.py [--years 1024] [--seeds 4]
       [--load-scale 0.8] [--level 250] [--k 4] [--hours 8736] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import powersystemsreliabilityassessment_tpu as psra  # noqa: F401
import jax
import jax.numpy as jnp

from powersystemsreliabilityassessment_tpu.core import cases, load_profile
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.models import twostate
from powersystemsreliabilityassessment_tpu.sampling import chronological
from powersystemsreliabilityassessment_tpu.studies.hl2_seq_split import (
    SplitConfig, run_seq_split_study)
from powersystemsreliabilityassessment_tpu.utils.config import MCSConfig


def calibrate(args):
    """Yearly min-margin distribution (no LP; sampler + einsum only)."""
    case = cases.rts24()
    sys_ = build_system(case)
    hours = args.hours
    fac = np.asarray(load_profile.load_factors(hours, "reference"),
                     np.float32) * args.load_scale
    mt = twostate.mean_times(case)
    n_draws = chronological.default_num_draws(mt[:, 0], mt[:, 1], hours)
    total_load = float(np.sum(np.asarray(sys_.load_pd)))
    ng = int(sys_.n_gen)

    @jax.jit
    def min_margin(key, sys, facd):
        keys = jax.random.split(key, 128)
        down = jax.vmap(lambda kk: chronological.sample_timeline(
            kk, sys.mttf, sys.mttr, hours, n_draws,
            quantize=False))(keys)
        up = 1.0 - down[:, :ng, :].astype(jnp.float32)
        cap = jnp.einsum("ygh,g->yh", up, sys.gen_pmax)
        return jnp.min(cap - facd[None, :] * total_load, axis=1)

    facd = jnp.asarray(fac)
    mm = []
    for b in range(max(args.years // 128, 1)):
        mm.append(np.asarray(min_margin(jax.random.fold_in(
            jax.random.key(args.seed), b), sys_, facd)))
    mm = np.concatenate(mm) * float(sys_.base_mva)
    qs = [1, 5, 10, 20, 50]
    print(f"load_scale={args.load_scale}: yearly min-margin MW "
          f"({len(mm)} years)")
    for q in qs:
        print(f"  P{q:02d} {np.percentile(mm, q):8.1f}")
    for lev in (0, 100, 200, 300, 400, 500):
        print(f"  entry fraction at level {lev:4d} MW: "
              f"{float(np.mean(mm < lev)):.3f}")


def run_arm(name, years, level, k, max_split, args, seed):
    t0 = time.time()
    r = run_seq_split_study(
        cases.rts24(),
        MCSConfig(max_years=years, cov_threshold=0.0, seed=seed),
        SplitConfig(level_mw=level, k_clones=k, max_split=max_split),
        years_per_device=args.years_per_device, max_lp=args.max_lp,
        hours=args.hours, load_scale=args.load_scale, log_every=0)
    wall = time.time() - t0
    ens = np.asarray(r.annual_ens, np.float64)
    var = float(np.var(ens, ddof=1)) if len(ens) > 1 else float("nan")
    print(f"  {name:>6s} seed {seed:3d}: EENS {r.eens_mwh_yr:10.4f} "
          f"+- {np.sqrt(var / max(r.years, 1)):8.4f} | per-yr var "
          f"{var:10.2f} | entered {r.split_entered:5d} | s-over "
          f"{r.split_overflow:4d} | wall {wall:6.1f}s")
    return r.eens_mwh_yr, var, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--years", type=int, default=1024)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--load-scale", type=float, default=0.8)
    ap.add_argument("--level", type=float, default=250.0)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--max-split", type=int, default=8)
    ap.add_argument("--hours", type=int, default=8736)
    ap.add_argument("--max-lp", type=int, default=64)
    ap.add_argument("--years-per-device", type=int, default=16)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--calibrate", action="store_true")
    args = ap.parse_args()

    if args.calibrate:
        calibrate(args)
        return

    print(f"load_scale={args.load_scale} level={args.level} MW "
          f"k={args.k} max_split={args.max_split} "
          f"backend={jax.default_backend()}")
    arms = {}
    for name, level, k in (("plain", -1e18, 1),
                           ("split", args.level, args.k)):
        means, vars_, walls = [], [], []
        for s in range(args.seeds):
            m, v, w = run_arm(name, args.years, level, k, args.max_split,
                              args, args.seed + 101 * s)
            means.append(m), vars_.append(v), walls.append(w)
        mu = float(np.mean(means))
        sem = float(np.std(means, ddof=1) / np.sqrt(len(means))) \
            if len(means) > 1 else float("nan")
        arms[name] = (mu, sem, float(np.mean(vars_)), float(np.mean(walls)))
        print(f"{name}: EENS {mu:.4f} +- {sem:.4f} (sem over "
              f"{args.seeds} seeds) | pooled per-yr var "
              f"{arms[name][2]:.2f} | mean wall {arms[name][3]:.1f}s")
    (mp, sp, vp, wp), (ms, ss, vs, ws) = arms["plain"], arms["split"]
    z = abs(mp - ms) / max(np.hypot(sp, ss), 1e-12)
    print(f"unbiasedness: |plain - split| = {abs(mp - ms):.4f} "
          f"({z:.2f} sigma)")
    print(f"variance reduction (per-yr var plain/split): {vp / vs:.2f}x")
    print(f"efficiency gain (var*wall plain / split):    "
          f"{vp * wp / (vs * ws):.2f}x")


if __name__ == "__main__":
    main()
