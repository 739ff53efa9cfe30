"""Structured batched LP solver: fused-kernel iterations + A-free polish.

Production TPU path for the DC-OPF load-shedding LP (RTS-24-class sizes).
The Mehrotra iteration loop runs entirely inside the fused Pallas kernel
(:mod:`..ops.ipm_fused` — state resident in VMEM, shared-matrix MXU
matmuls); this module supplies the identical post-processing that
:mod:`.lp_ipm_batched` applies after its XLA loop (best-iterate selection,
primal re-projection, Woodbury crossover polish), with every A-product
computed from the shared LP structure instead of a materialized
[B, m, n] constraint tensor.

Algebra used throughout (see ops/ipm_fused.py docstring): for the DC-OPF
LP, A_lane differs across lanes only by the generator-availability column
scaling and the branch-status row scaling of the flow block, so

    A x,  A' y            two small shared matmuls each
    A diag(w) A'          P_bal @ w  (+ flow terms)     — "normal form"

which is what makes both the fused kernel and this polish A-free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from powersystemsreliabilityassessment_tpu.engines.lp_ipm_batched import (
    LPBatchSolution, _make_chol_ops)
from powersystemsreliabilityassessment_tpu.ops.ipm_fused import (
    LPStructure, fused_ipm_iterations)
from powersystemsreliabilityassessment_tpu.utils.config import IPMConfig


def mv(st: LPStructure, colscale, bru, v):
    """Batched A v: [B, n] -> [B, m]."""
    f_lo, f_hi = st.ng + st.nd, st.ng + st.nd + st.nl
    top = (colscale * v) @ st.a0_balT                     # [B, nb]
    bot = (st.inv_b[:, 0][None, :] * v[:, f_lo:f_hi]
           - bru * (v[:, f_hi:] @ st.minc_refT))          # [B, nl]
    return jnp.concatenate([top, bot], axis=1)


def mtv(st: LPStructure, colscale, bru, y):
    """Batched A' y: [B, m] -> [B, n]."""
    yb, yf = y[:, :st.nb], y[:, st.nb:]
    r = colscale * (yb @ st.a0_bal)
    f_lo, f_hi = st.ng + st.nd, st.ng + st.nd + st.nl
    return jnp.concatenate([
        r[:, :f_lo],
        r[:, f_lo:f_hi] + st.inv_b[:, 0][None, :] * yf,
        r[:, f_hi:] - (bru * yf) @ st.minc_ref], axis=1)


def normal_matrix(st: LPStructure, wb, bru):
    """Batched A diag(cw) A' where wb = colscale^2 * cw: [B, n] -> [B,m,m].

    PRECONDITION: colscale must be 1.0 on every non-generator column
    (shed/f/theta) — the decomposition folds the column scaling into wb
    uniformly, which matches ``mv``/``mtv``'s A only because the flow
    rows see unscaled f/theta columns. ``dcopf.build_state_lp_vectors``
    guarantees this; do not reuse LPStructure with a colscale that
    touches the f/theta slice (the fused kernel shares the assumption).
    """
    B = wb.shape[0]
    nb, nl = st.nb, st.nl
    f_lo, f_hi = st.ng + st.nd, st.ng + st.nd + st.nl
    w_f = wb[:, f_lo:f_hi]
    g = w_f * st.inv_b[:, 0][None, :]                     # [B, nl]
    mbb = (wb @ st.p_bal.T).reshape(B, nb, nb)
    mbf = st.neg_incT[None, :, :] * g[:, None, :]         # [B, nb, nl]
    mfb = jnp.swapaxes(mbf, 1, 2)
    mtt = ((wb[:, f_hi:] @ st.q_theta.T).reshape(B, nl, nl)
           * bru[:, :, None] * bru[:, None, :])
    mtt = mtt + jnp.eye(nl, dtype=wb.dtype)[None] * (
        st.inv_b[:, 0][None, :] * g)[:, :, None]
    return jnp.concatenate([
        jnp.concatenate([mbb, mbf], axis=2),
        jnp.concatenate([mfb, mtt], axis=2)], axis=1)


def solve_box_lp_structured(st: LPStructure, colscale, br_up, c, b, l, u,
                            cfg: IPMConfig = IPMConfig()) -> LPBatchSolution:
    """Solve the batch of structured DC-OPF LPs.

    Same contract and safeguards as ``lp_ipm_batched.solve_box_lp_batched``
    (which remains the generic-A path); the iteration loop runs in the
    fused Pallas kernel.
    """
    dtype = jnp.dtype(cfg.dtype)
    colscale = colscale.astype(dtype)
    br_up = br_up.astype(dtype)
    c, b = c.astype(dtype), b.astype(dtype)
    l, u = l.astype(dtype), u.astype(dtype)
    B = c.shape[0]
    m, n = st.m, st.n

    x, y, zl, zu, best_score, best_x = fused_ipm_iterations(
        st, colscale, br_up, c, b, l, u, cfg)

    factor, chol_solve = _make_chol_ops(B, m)
    delta = jnp.asarray(cfg.regularization, dtype)
    eye_m = jnp.eye(m, dtype=dtype)

    def bdot(p, q):
        return jnp.sum(p * q, axis=-1)

    def equilibrated_chol(M):
        diag = jnp.diagonal(M, axis1=1, axis2=2)
        s = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))
        Ms = M * s[:, :, None] * s[:, None, :] + delta * eye_m
        return factor(Ms), s

    def eq_solve(chol_s, rhs):
        chol, s = chol_s
        return s * chol_solve(chol, s * rhs)

    chol_aat = equilibrated_chol(normal_matrix(
        st, colscale * colscale, br_up))

    def project(xv):
        return xv + mtv(st, colscale, br_up,
                        eq_solve(chol_aat, b - mv(st, colscale, br_up, xv)))

    width = u - l

    # Final candidate vs best-ever, then one projection polish.
    sl = jnp.maximum(x - l, 1e-12)
    su = jnp.maximum(u - x, 1e-12)
    rp_f = b - mv(st, colscale, br_up, x)
    mu_f = (bdot(sl, zl) + bdot(su, zu)) / (2 * n)
    score_f = mu_f + jnp.max(jnp.abs(rp_f), axis=-1)
    x = jnp.where((score_f <= best_score)[:, None], x, best_x)
    x = jnp.clip(project(x), l, u)

    # Crossover polish via Woodbury (identical to lp_ipm_batched).
    snap_tol = 1e-3 * width
    at_l = (x - l) < snap_tol
    at_u = (u - x) < snap_tol
    target = jnp.where(at_l, l, jnp.where(at_u, u, x))
    w = jnp.where(at_l | at_u, 1e2, 1e-4)
    rhs = mtv(st, colscale, br_up, b) + w * target
    winv = 1.0 / w
    K = normal_matrix(st, colscale * colscale * winv, br_up) + eye_m
    cholK = equilibrated_chol(K)
    t1 = winv * rhs
    t2 = eq_solve(cholK, mv(st, colscale, br_up, t1))
    xp = t1 - winv * mtv(st, colscale, br_up, t2)
    xp = jnp.clip(project(xp), l, u)
    ok = (jnp.all(jnp.isfinite(xp), axis=-1)
          & (jnp.max(jnp.abs(mv(st, colscale, br_up, xp) - b), axis=-1)
             <= jnp.max(jnp.abs(mv(st, colscale, br_up, x) - b), axis=-1)
             + 1e-5)
          & (bdot(c, xp) <= bdot(c, x)))
    x = jnp.where(ok[:, None], xp, x)

    rp = b - mv(st, colscale, br_up, x)
    sl = jnp.maximum(x - l, 1e-12)
    su = jnp.maximum(u - x, 1e-12)
    mu = (bdot(sl, zl) + bdot(su, zu)) / (2 * n)
    return LPBatchSolution(
        x=x,
        objective=bdot(c, x),
        primal_residual=jnp.max(jnp.abs(rp), axis=-1),
        duality_gap=mu,
    )
