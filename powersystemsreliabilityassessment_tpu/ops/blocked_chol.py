"""Blocked batch-minor Cholesky for systems too large for one VMEM tile.

The direct kernel in :mod:`.batched_chol` holds a full [m, m, 128] tile in
VMEM, capping m at ~88. Larger systems (e.g. RTS-96's 191x191 normal
matrices) use a classic left-looking panel factorization:

    for each diagonal panel j:                (panel width P, static)
        S_jj = M_jj - sum_k L_jk L_jk'        (MXU batched matmul)
        L_jj = chol(S_jj)                     (direct Pallas kernel)
        for each i > j:
            B = M_ij - sum_k L_ik L_jk'       (MXU batched matmul)
            L_ij' = trsm_lower(L_jj, B')      (Pallas forward solve)

The cross-panel updates are ordinary batch-major matmuls (MXU-friendly);
only the panel-local factorization and triangular solves run in the
batch-minor Pallas kernels. Solves traverse panels forward then backward
with the same kernels (K=1 right-hand sides).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from powersystemsreliabilityassessment_tpu.ops import batched_chol as bc

LANES = bc.LANES
PANEL = 56  # Mosaic double-buffers each grid input: ~7 tiles live; 56^2*128*4B*7 = 11 MB


def _trsm_fwd_kernel(l_ref, b_ref, out_ref):
    """X = L^{-1} B per lane. l: [1,P,P,128], b: [1,P,K,128] (row blocks)."""
    p = l_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (p, 1, 1), 0)

    def body(x):
        x[...] = b_ref[0]

        def step(i, _):
            li = l_ref[0, pl.ds(i, 1), :, :]               # [1,p,128]
            li_col = jnp.reshape(li, (p, 1, LANES))        # row i as column
            s = jnp.sum(jnp.where(row < i, li_col * x[...], 0.0),
                        axis=0, keepdims=True)             # [1,K,128]
            lii = l_ref[0, pl.ds(i, 1), pl.ds(i, 1), :]    # [1,1,128]
            x[pl.ds(i, 1), :, :] = (x[pl.ds(i, 1), :, :] - s) / lii
            return 0

        jax.lax.fori_loop(0, p, step, 0)
        out_ref[0] = x[...]

    pl.run_scoped(body, pltpu.VMEM(b_ref.shape[1:], b_ref.dtype))


def _trsm_bwd_kernel(l_ref, b_ref, out_ref):
    """X = L^{-T} B per lane (backward substitution on L's columns)."""
    p = l_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (p, 1, 1), 0)

    def body(x):
        x[...] = b_ref[0]

        def step(t, _):
            i = p - 1 - t
            lc = l_ref[0, :, pl.ds(i, 1), :]               # [p,1,128]
            s = jnp.sum(jnp.where(row > i, lc * x[...], 0.0),
                        axis=0, keepdims=True)             # [1,K,128]
            lii = l_ref[0, pl.ds(i, 1), pl.ds(i, 1), :]
            x[pl.ds(i, 1), :, :] = (x[pl.ds(i, 1), :, :] - s) / lii
            return 0

        jax.lax.fori_loop(0, p, step, 0)
        out_ref[0] = x[...]

    pl.run_scoped(body, pltpu.VMEM(b_ref.shape[1:], b_ref.dtype))


def _call_trsm(kernel, l_bm, b_bm):
    nblk, p = l_bm.shape[0], l_bm.shape[1]
    k = b_bm.shape[2]
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, p, p, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, k, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, k, LANES), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(b_bm.shape, b_bm.dtype),
        interpret=jax.default_backend() != "tpu",
    )(l_bm, b_bm)


def trsm_fwd(l_bm, b_bm):
    """[nblk,P,P,128], [nblk,P,K,128] -> L^{-1} B."""
    return _call_trsm(_trsm_fwd_kernel, l_bm, b_bm)


def trsm_bwd(l_bm, b_bm):
    """[nblk,P,P,128], [nblk,P,K,128] -> L^{-T} B."""
    return _call_trsm(_trsm_bwd_kernel, l_bm, b_bm)


def _panels(m: int):
    """Static panel split of m into widths <= PANEL."""
    edges = list(range(0, m, PANEL)) + [m]
    return [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]


# Relative diagonal lift applied to each panel's Schur complement: float32
# Schur updates of ill-conditioned normal matrices can lose positive
# definiteness to cancellation, and cholesky_bm's rsqrt-clamp turns a
# negative pivot into garbage rows. The lift keeps every panel
# factorizable; the iterative refinement in blocked_cho_solve then removes
# the perturbation from the SOLUTION. Measured end-to-end in the IPM on
# deep contingencies (v5e): lift 1e-4 with no refinement leaves lane-
# quality scores at ~6e-1 — past the 5e-3 trust guard on every lane —
# while (1e-5, 2 steps) matches the XLA-path quality exactly at m=191,
# 256 and 320 (median ~5e-5, zero extra guard trips) and still runs the
# whole evaluator 3.3x faster than XLA at m=191 (51 vs 170 ms/128-batch).
# (1e-4, 4 steps) and (1e-5, 1 step) both leave stragglers; don't lower
# LIFT further without re-checking panel positive-definiteness at m>300.
LIFT = 1e-5
REFINE_STEPS = 2

# Fragile-lane rescue: ~1/128 deep-contingency lanes at m~320 have a
# normal matrix whose f32 Schur cancellation loses positive definiteness
# past the base lift — their factor is bounded (cholesky_bm's pivot
# floor) but useless, and refinement cannot recover it. Such lanes are
# detected at factor time by a probe solve run through the SAME
# refinement schedule as the real solve (M x = M 1 must return ~1; a
# healthy factor lands ~1e-5, a PD-lost one O(1), so the 1e-2 threshold
# separates them cleanly), and when any exists the batch is factored
# once more by XLA's batched Cholesky under ``lax.cond``; the bad lanes'
# panels are spliced from that factor (measured healthy on exactly these
# matrices — it was the pre-blocked fallback path). A bigger "escalated"
# panel lift does NOT work instead: removing an O(lift) perturbation by
# refinement contracts ~lift*kappa per step, and these matrices have
# kappa >> 1e3.
PROBE_BAD_REL = 1e-2     # probe-solve max|x-1| above this flags the lane


def _factor_once(M: jax.Array):
    """One blocked panel-factorization pass with the standard lift."""
    B, m, _ = M.shape
    panels = _panels(m)
    Ls: list = []
    Loff: dict = {}
    for j, (j0, j1) in enumerate(panels):
        S = M[:, j0:j1, j0:j1]
        for k in range(j):
            Ljk = Loff[(j, k)]
            S = S - Ljk @ jnp.swapaxes(Ljk, 1, 2)
        diag = jnp.diagonal(S, axis1=1, axis2=2)
        lift = LIFT * jnp.maximum(diag, 1e-30)
        S = S + jax.vmap(jnp.diag)(lift)
        Lj_bm = bc.cholesky_bm(bc.to_batch_minor(S))
        Ls.append(Lj_bm)
        for i in range(j + 1, len(panels)):
            i0, i1 = panels[i]
            Bij = M[:, i0:i1, j0:j1]
            for k in range(j):
                Bij = Bij - Loff[(i, k)] @ jnp.swapaxes(Loff[(j, k)], 1, 2)
            # L_ij = B L_jj^{-T}  <=>  L_ij^T = L_jj^{-1} B^T
            Xt = trsm_fwd(Lj_bm,
                          bc.to_batch_minor(jnp.swapaxes(Bij, 1, 2)))
            Loff[(i, j)] = jnp.swapaxes(bc.from_batch_minor(Xt), 1, 2)
    return panels, Ls, Loff


def blocked_cholesky(M: jax.Array):
    """Batched blocked Cholesky. M: [B, m, m] -> list-of-panels factor.

    Returns (panels, Ls, Loffs, M): diagonal-panel factors ``Ls[j]`` in
    batch-minor layout, off-diagonal blocks ``Loffs[(i, j)]`` in
    batch-major [B, pi, pj], and the original matrix (kept for iterative
    refinement in :func:`blocked_cho_solve`). Lanes whose factor fails
    the probe solve (see PROBE_BAD_REL) get their panels spliced from an
    XLA batched-Cholesky factor computed under ``lax.cond`` — one extra
    full factorization, executed only when a fragile lane exists.
    """
    panels, Ls, Loff = _factor_once(M)

    # Probe through the real refinement schedule: healthy factors
    # reproduce x = 1 from r = M @ 1 to ~1e-5; PD-lost factors stay O(1).
    r = jnp.sum(M, axis=2)
    x = _blocked_substitute(panels, Ls, Loff, r)
    for _ in range(REFINE_STEPS):
        x = x + _blocked_substitute(
            panels, Ls, Loff, r - jnp.einsum("bmn,bn->bm", M, x))
    bad = jnp.max(jnp.abs(x - 1.0), axis=1) > PROBE_BAD_REL

    def rescue(_):
        Lx = jnp.linalg.cholesky(M)                    # [B, m, m]
        # A lane non-PD even for XLA yields NaNs (which reach the last
        # pivot); keep the blocked factor there — the quality guard
        # downstream degrades it to certified bounds as before.
        ok = bad & jnp.isfinite(Lx[:, -1, -1])
        sel_bm = bc.to_batch_minor(ok[:, None, None])  # [nblk,1,1,128]
        Lm, Lo = [], {}
        for j, (j0, j1) in enumerate(panels):
            xj = bc.to_batch_minor(Lx[:, j0:j1, j0:j1])
            Lm.append(jnp.where(sel_bm, xj, Ls[j]))
            for i in range(j + 1, len(panels)):
                i0, i1 = panels[i]
                Lo[(i, j)] = jnp.where(ok[:, None, None],
                                       Lx[:, i0:i1, j0:j1], Loff[(i, j)])
        return Lm, Lo

    Ls, Loff = jax.lax.cond(jnp.any(bad), rescue,
                            lambda _: (Ls, Loff), None)
    return panels, Ls, Loff, M


def blocked_cho_solve(factor, r: jax.Array) -> jax.Array:
    """Solve M x = r given a blocked factor of (M + panel lifts).

    The base substitution solves the LIFTED system exactly; iterative
    refinement against the original M (carried in the factor) removes the
    lift's contribution: each step contracts the error by roughly
    ``LIFT * kappa(M_panel)``, so REFINE_STEPS=2 recovers ~f32 accuracy
    for the IPM's equilibrated normal matrices. Cost per step is one
    [B,m,m]x[B,m] matvec plus one substitution pass — O(m^2), negligible
    next to the O(m^3) factorization.
    """
    panels, Ls, Loff, M = factor

    def residual(x):
        return r - jnp.einsum("bmn,bn->bm", M, x)

    # Keep-best across refinement iterates: on the rare lane whose panel
    # factor lost positive definiteness despite the lift AND resisted the
    # XLA rescue (cholesky_bm clamps the pivot and produces a poor
    # factor), refinement can diverge — never return an iterate worse
    # than the best seen.
    x = _blocked_substitute(panels, Ls, Loff, r)
    best_x, best_rn = x, jnp.max(jnp.abs(residual(x)), axis=1)
    for _ in range(REFINE_STEPS):
        x = x + _blocked_substitute(panels, Ls, Loff, residual(x))
        rn = jnp.max(jnp.abs(residual(x)), axis=1)
        better = rn < best_rn
        best_x = jnp.where(better[:, None], x, best_x)
        best_rn = jnp.minimum(rn, best_rn)
    return best_x


def explicit_spd_inv(M: jax.Array) -> jax.Array:
    """Explicit M^-1 of an SPD batch via the Pallas panel factor.

    For the block-Schur large-m IPM path (engines/lp_ipm_batched), which
    needs M^-1 both applied to a MATRIX right-hand side (forming the
    Schur complement S = D + G K^-1 G') and as repeated per-iteration
    matvecs — an explicit inverse turns every downstream use into an
    MXU matmul, with zero loop-lowered XLA ops past the factor itself.

    Route: blocked Pallas factor (panel lift + probe/XLA-rescue as in
    :func:`blocked_cholesky`), per-panel L_ii^-1 by identity-rhs
    ``trsm_fwd`` (the only non-matmul ops), L^-1 assembled by block
    forward substitution in matmuls, then M^-1 = L^-T L^-1. The lift
    perturbation and the explicit-inverse rounding (~cond(L) vs
    substitution) are both removed by the CALLER's iterative
    refinement against the true operator — same contract as
    :func:`blocked_cho_solve`'s internal refinement.
    """
    panels, Ls, Loff, _ = blocked_cholesky(M)
    B, m, _ = M.shape
    inv_diag = []
    for i, (i0, i1) in enumerate(panels):
        p = i1 - i0
        eyeb = jnp.broadcast_to(jnp.eye(p, dtype=M.dtype)[None],
                                (B, p, p))
        inv_diag.append(bc.from_batch_minor(
            trsm_fwd(Ls[i], bc.to_batch_minor(eyeb))))
    Linv = jnp.zeros_like(M)
    Linv = Linv.at[:, :panels[0][1], :panels[0][1]].set(inv_diag[0])
    for i in range(1, len(panels)):
        i0, i1 = panels[i]
        slab = jnp.concatenate([Loff[(i, k)] for k in range(i)], axis=2)
        S = jnp.einsum("bpk,bkj->bpj", slab, Linv[:, :i0, :i0])
        Linv = Linv.at[:, i0:i1, :i0].set(
            -jnp.einsum("bpq,bqj->bpj", inv_diag[i], S))
        Linv = Linv.at[:, i0:i1, i0:i1].set(inv_diag[i])
    return jnp.einsum("bki,bkj->bij", Linv, Linv)


def _blocked_substitute(panels, Ls, Loff, r: jax.Array) -> jax.Array:
    """One forward+backward substitution pass through the panel factor."""
    n_p = len(panels)
    # forward: y_i = L_ii^{-1} (r_i - sum_{k<i} L_ik y_k)
    ys = []
    for i, (i0, i1) in enumerate(panels):
        ri = r[:, i0:i1]
        for k in range(i):
            ri = ri - jnp.einsum("bpq,bq->bp", Loff[(i, k)], ys[k])
        yi = bc.from_batch_minor(
            trsm_fwd(Ls[i], bc.to_batch_minor(ri[:, :, None])))[:, :, 0]
        ys.append(yi)
    # backward: x_i = L_ii^{-T} (y_i - sum_{k>i} L_ki' x_k)
    xs = [None] * n_p
    for i in range(n_p - 1, -1, -1):
        yi = ys[i]
        for k in range(i + 1, n_p):
            yi = yi - jnp.einsum("bqp,bq->bp", Loff[(k, i)], xs[k])
        xs[i] = bc.from_batch_minor(
            trsm_bwd(Ls[i], bc.to_batch_minor(yi[:, :, None])))[:, :, 0]
    return jnp.concatenate(xs, axis=1)
