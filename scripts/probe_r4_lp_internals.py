"""Round-4 probe: where does the m=792 LP pass spend its time, and does
a 2x2 block-Schur factorization beat XLA's direct batched Cholesky?

The case300s screened step is 97% LP tail (results/case300_step_profile
.json) and the per-iteration costs are (a) structured gram assembly
(make_dc_linops.normal), (b) the [B, 792, 792] f32 Cholesky, (c)
triangular solves + refinement. The normal matrix has the 2x2 block
structure [[M_bb (nb=300), M_bf], [M_fb, M_ff (nl=492)]], so a block
factorization

    L_bb = chol(M_bb)            X = L_bb^-1 M_bf  (triangular, 492 rhs)
    S    = M_ff - X'X  (MXU matmul)                L_s = chol(S)

replaces one 792-Cholesky by a 300- and a 492-Cholesky plus two
MXU-friendly matmuls. XLA's batched Cholesky cost grows superlinearly
in m on TPU (while-loop lowering), so (300^3 + 492^3)/792^3 = 0.29 of
the serial work + matmuls that run at MXU speed.

Timing hygiene (CLAUDE.md): k solves inside ONE dispatch via lax.scan,
slope between k=2 and k=10; fresh barrier weights per scan iteration
(folded keys) so the relay cache cannot fire.

Usage: python scripts/probe_r4_lp_internals.py [--out results/r4_lp_internals.json]
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
import jax.numpy as jnp

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines import dcopf


def block_schur_factor(M, nb):
    """2x2 block Cholesky of [B, m, m] with leading block size nb."""
    M_bb = M[:, :nb, :nb]
    M_bf = M[:, :nb, nb:]
    M_ff = M[:, nb:, nb:]
    L_bb = jnp.linalg.cholesky(M_bb)
    X = jax.lax.linalg.triangular_solve(
        L_bb, M_bf, left_side=True, lower=True, transpose_a=False)
    S = M_ff - jnp.einsum("bkf,bkg->bfg", X, X)
    L_s = jnp.linalg.cholesky(S)
    return L_bb, X, L_s


def block_schur_solve(F, r, nb):
    L_bb, X, L_s = F
    r_b, r_f = r[:, :nb], r[:, nb:]
    t = jax.lax.linalg.triangular_solve(
        L_bb, r_b[:, :, None], left_side=True, lower=True)[:, :, 0]
    rhs_f = r_f - jnp.einsum("bkf,bk->bf", X, t)
    u = jax.lax.linalg.triangular_solve(
        L_s, rhs_f[:, :, None], left_side=True, lower=True)[:, :, 0]
    y_f = jax.lax.linalg.triangular_solve(
        L_s, u[:, :, None], left_side=True, lower=True,
        transpose_a=True)[:, :, 0]
    y_b = jax.lax.linalg.triangular_solve(
        L_bb, (t - jnp.einsum("bkf,bf->bk", X, y_f))[:, :, None],
        left_side=True, lower=True, transpose_a=True)[:, :, 0]
    return jnp.concatenate([y_b, y_f], axis=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/r4_lp_internals.json")
    ap.add_argument("--lanes", type=int, default=128)
    args = ap.parse_args()

    case = cases.case300s()
    sys_ = build_system(case)
    nb, nl, ng, nd = sys_.n_bus, sys_.n_branch, sys_.n_gen, sys_.n_load
    m = nb + nl
    n = ng + nd + nl + nb
    B = args.lanes
    print(f"m={m} n={n} B={B} backend={jax.default_backend()}", flush=True)

    # A representative lane population: random outage states.
    rng = np.random.default_rng(0)
    gen_col = (rng.random((B, ng)) > 0.05).astype(np.float32)
    br_up = (rng.random((B, nl)) > 0.01).astype(np.float32)
    lops = dcopf.make_dc_linops(sys_, jnp.asarray(gen_col),
                                jnp.asarray(br_up))
    eye = np.eye(m, dtype=np.float32)

    def fresh_d(key):
        # barrier-weight-like diagonal, varied per call
        return jnp.exp(jax.random.uniform(key, (B, n), minval=-6.0,
                                          maxval=6.0))

    def equilibrate(M):
        diag = jnp.diagonal(M, axis1=1, axis2=2)
        s = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))
        return M * s[:, :, None] * s[:, None, :] + 1e-6 * eye

    def scan_time(body, k, key0):
        @jax.jit
        def run(key):
            def step(carry, i):
                kk = jax.random.fold_in(key, i)
                return carry + body(kk), None
            out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.arange(k))
            return out
        jax.block_until_ready(run(jax.random.key(key0)))  # compile
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jax.random.key(key0 + 1 + r)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def slope(body, key0):
        t2 = scan_time(body, 2, key0)
        t8 = scan_time(body, 8, key0 + 50)
        return (t8 - t2) / 6.0

    results = {}

    def body_gram(kk):
        M = lops.normal(fresh_d(kk))
        return jnp.sum(M[:, 0, 0])

    def body_direct_solve(kk):
        M = equilibrate(lops.normal(fresh_d(kk)))
        L = jnp.linalg.cholesky(M)
        r = jax.random.normal(jax.random.fold_in(kk, 1), (B, m))
        cs = jax.vmap(lambda LL, rr: jax.scipy.linalg.cho_solve(
            (LL, True), rr))
        dy = cs(L, r)
        for _ in range(2):
            dy = dy + cs(L, r - jnp.einsum("bij,bj->bi", M, dy))
        return jnp.sum(dy)

    def body_schur_solve(kk):
        M = equilibrate(lops.normal(fresh_d(kk)))
        F = block_schur_factor(M, nb)
        r = jax.random.normal(jax.random.fold_in(kk, 1), (B, m))
        dy = block_schur_solve(F, r, nb)
        for _ in range(2):
            dy = dy + block_schur_solve(
                F, r - jnp.einsum("bij,bj->bi", M, dy), nb)
        return jnp.sum(dy)

    for name, body in [("gram", body_gram),
                       ("gram_chol_solve_direct", body_direct_solve),
                       ("gram_chol_solve_schur", body_schur_solve)]:
        s = slope(body, hash(name) % 1000)
        results[name + "_s"] = round(s, 5)
        print(f"{name}: {s * 1e3:.2f} ms/iter", flush=True)

    # Correctness: direct vs schur solve residuals on one fresh system.
    key = jax.random.key(7)
    d = fresh_d(key)
    M = equilibrate(lops.normal(d))
    r = jax.random.normal(jax.random.fold_in(key, 1), (B, m))
    L = jnp.linalg.cholesky(M)
    cs = jax.vmap(lambda LL, rr: jax.scipy.linalg.cho_solve((LL, True), rr))
    dy_direct = cs(L, r)
    for _ in range(2):
        dy_direct = dy_direct + cs(
            L, r - jnp.einsum("bij,bj->bi", M, dy_direct))
    F = block_schur_factor(M, nb)
    dy_schur = block_schur_solve(F, r, nb)
    for _ in range(2):
        dy_schur = dy_schur + block_schur_solve(
            F, r - jnp.einsum("bij,bj->bi", M, dy_schur), nb)
    # Per-lane residuals, reported as median-over-finite + bad-lane
    # counts: the synthetic exp(U[-6,6]) barrier weights intentionally
    # include lanes past what a bare f32 factor + 2 refinements can
    # handle (that is WHY the production IPM carries equilibration,
    # keep-best refinement, best-iterate and the rescue ladder —
    # lp_ipm_batched); a max over lanes would just report those
    # outliers (observed: NaN direct / 0.43 schur on this seed).
    rd_l = jnp.max(jnp.abs(jnp.einsum("bij,bj->bi", M, dy_direct) - r),
                   axis=1)
    rs_l = jnp.max(jnp.abs(jnp.einsum("bij,bj->bi", M, dy_schur) - r),
                   axis=1)
    rd_np, rs_np = np.asarray(rd_l, np.float64), np.asarray(rs_l,
                                                            np.float64)
    results["resid_direct_median"] = float(np.nanmedian(rd_np))
    results["resid_schur_median"] = float(np.nanmedian(rs_np))
    results["lanes_direct_bad"] = int(np.sum(~np.isfinite(rd_np)
                                             | (rd_np > 1e-2)))
    results["lanes_schur_bad"] = int(np.sum(~np.isfinite(rs_np)
                                            | (rs_np > 1e-2)))
    diff = np.asarray(jnp.abs(dy_direct - dy_schur), np.float64)
    results["solution_maxdiff_median_lane"] = float(
        np.nanmedian(diff.max(axis=1)))
    print(f"residual medians direct {results['resid_direct_median']:.2e} "
          f"schur {results['resid_schur_median']:.2e}; bad lanes "
          f"{results['lanes_direct_bad']}/{results['lanes_schur_bad']} "
          f"of {B}", flush=True)

    results.update(m=m, n=n, B=B, nb=nb, nl=nl,
                   backend=jax.default_backend())
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
