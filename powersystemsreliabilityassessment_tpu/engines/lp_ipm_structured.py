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
import numpy as np

from powersystemsreliabilityassessment_tpu.engines.lp_ipm_batched import (
    LPBatchSolution, polish_box_lp)
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
    mtt = mtt + np.eye(nl, dtype=wb.dtype)[None] * (
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

    x, y, zl, zu, best_score, best_x = fused_ipm_iterations(
        st, colscale, br_up, c, b, l, u, cfg)

    # Post-iteration polish shared with the generic solver; the
    # constraint operator is supplied through the structured (A-free)
    # products. gram_fn's weight composes with colscale^2 per the
    # normal_matrix precondition.
    return polish_box_lp(
        (x, y, zl, zu, best_score, best_x), c, b, l, u, cfg,
        mv_fn=lambda v: mv(st, colscale, br_up, v),
        mtv_fn=lambda yy: mtv(st, colscale, br_up, yy),
        gram_fn=lambda w: normal_matrix(st, colscale * colscale * w,
                                        br_up))
