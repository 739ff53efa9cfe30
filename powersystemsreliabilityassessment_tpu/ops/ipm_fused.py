"""Fused interior-point iteration kernel for the structured DC-OPF LP.

The batched solver in :mod:`..engines.lp_ipm_batched` spends most of each
iteration NOT in math but in HBM traffic: it materializes the per-lane
constraint matrix A [B, m, n], forms G = A*rsqrt(d) [B, m, n] and the
normal matrix M = G G' [B, m, m] in HBM every iteration, and transposes
to/from the batch-minor kernel layout around every factorization.

This module exploits the *structure* of the DC-OPF LP
(``engines/dcopf.py::build_state_lp``): across scenarios the constraint
matrix differs only by elementwise scalings —

    A_lane = [ A0_bal * colscale[lane]                                ]
             [ 0 | 0 | diag(1/b) | -br_up[lane] * (Minc * ref_mask)   ]

where A0_bal = [Cg | Cd | -Minc' | 0] and all matrices are SHARED. Hence:

* every A-product is two small shared matmuls with the 128-lane batch as
  the MXU's N dimension (e.g. ``A x = [A0_bal @ (colscale*x); ...]``);
* the normal matrix M = A diag(1/d) A' decomposes into two shared
  "pair-product" matmuls plus elementwise terms:
      M[bal,bal]  = P_bal  @ (colscale^2/d)      P_bal[(i,j),k] = A0ik*A0jk
      M[flow,flow]= bru⊗bru * (Q_theta @ (1/d_theta)) + diag(1/b^2 / d_f)
      M[bal,flow] = -Minc'[i,l] * (1/d_f)_l * (1/b)_l        (rank-free)
  — so the WHOLE Mehrotra iteration (normal-matrix formation,
  equilibration, Cholesky, two Newton solves, fraction-to-boundary
  reductions, freeze/best bookkeeping) runs in ONE Pallas kernel with all
  state resident in VMEM across all iterations. HBM traffic is one read
  of the bound/cost vectors and one write of the final iterate.

Replaces the reference's per-state MIPS solves (mc_simulation.m:41) on
the TPU production path for RTS-24-class LPs (m <= ~72; larger systems
keep the generic blocked path).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from powersystemsreliabilityassessment_tpu.ops.batched_chol import (
    LANES, PIVOT_FLOOR, from_batch_minor, to_batch_minor)
from powersystemsreliabilityassessment_tpu.utils.config import IPMConfig


class LPStructure(NamedTuple):
    """Shared (lane-independent) pieces of the DC-OPF LP, host-precomputed."""
    a0_bal: jax.Array     # [nb, n]   unscaled balance block
    a0_balT: jax.Array    # [n, nb]
    minc_ref: jax.Array   # [nl, nb]  incidence * ref-bus mask
    minc_refT: jax.Array  # [nb, nl]
    neg_incT: jax.Array   # [nb, nl]  -incidence' (the f-column block of bal)
    neg_inc: jax.Array    # [nl, nb]
    inv_b: jax.Array      # [nl, 1]   1/b_l (branch reactance x_l)
    p_bal: jax.Array      # [nb*nb, n]   pair products A0ik*A0jk
    q_theta: jax.Array    # [nl*nl, nb]  pair products mref_l1j*mref_l2j
    ng: int
    nd: int
    nl: int
    nb: int

    @property
    def n(self) -> int:
        return self.ng + self.nd + self.nl + self.nb

    @property
    def m(self) -> int:
        return self.nb + self.nl


def build_structure(sys) -> LPStructure:
    """Precompute the shared LP structure from a ``System`` pytree.

    Mirrors ``engines/dcopf.py::build_state_lp`` exactly: the balance
    block is [Cg | Cd | -Minc' | 0] (gen columns later scaled by
    availability), the flow block is [0 | 0 | diag(1/b) | -br_up*Minc_ref]
    with the reference bus's theta column zeroed (gauge fix).
    """
    import numpy as np
    dt = sys.bus_pd.dtype
    nb, ng, nl, nd = sys.n_bus, sys.n_gen, sys.n_branch, sys.n_load
    a0 = jnp.concatenate([
        sys.gen_bus_onehot, sys.load_onehot, -sys.incidence.T,
        np.zeros((nb, nb), dt)], axis=1)                       # [nb, n]
    ref_mask = (np.arange(nb) != 0).astype(dt)
    mref = sys.incidence * ref_mask[None, :]                   # [nl, nb]
    p_bal = (a0[:, None, :] * a0[None, :, :]).reshape(nb * nb, -1)
    q_theta = (mref[:, None, :] * mref[None, :, :]).reshape(nl * nl, nb)
    return LPStructure(
        a0_bal=a0, a0_balT=a0.T,
        minc_ref=mref, minc_refT=mref.T,
        neg_incT=-sys.incidence.T, neg_inc=-sys.incidence,
        inv_b=(1.0 / sys.b_susceptance)[:, None],
        p_bal=p_bal, q_theta=q_theta,
        ng=ng, nd=nd, nl=nl, nb=nb)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Sublane row-block size for the factor scratch: the trailing updates are
# predicated per 8-row strip, and m is padded up to a multiple of this.
PANEL_R = 8

# Profiling hook (scripts/ only): names of kernel stages to skip, so the
# cost of each stage can be isolated by ablation on hardware. Any of
# {"form", "chol", "solve", "resid", "affine", "corrector"}. Produces
# WRONG RESULTS when non-empty. Pass it explicitly via
# ``fused_ipm_iterations(..., ablate=...)`` (profiling scripts only);
# the module-level default exists so the engine call sites stay clean.
# A non-empty set is baked in at TRACE time, so passing it explicitly —
# never mutating a global mid-process — is the only safe pattern; the
# guard in fused_ipm_iterations enforces it.
ABLATE: frozenset = frozenset()


def _padded_m(m: int) -> int:
    return ((m + PANEL_R - 1) // PANEL_R) * PANEL_R


def _make_kernel(st_dims, cfg: IPMConfig, n_total: int,
                 ablate: frozenset = frozenset()):
    """Build the fused-iteration kernel for static dims (ng, nd, nl, nb)."""
    ng, nd, nl, nb = st_dims
    n = ng + nd + nl + nb
    m = nb + nl
    f_lo, f_hi = ng + nd, ng + nd + nl                  # f-variable slice
    iters = int(cfg.iterations)
    tau = float(cfg.tau)
    delta = float(cfg.regularization)
    mu_tol = float(cfg.mu_tol)
    center_tol = float(cfg.center_tol)

    mp = _padded_m(m)

    def kernel(colscale_ref, bru_ref, c_ref, b_ref, l_ref, u_ref,
               a0_ref, a0t_ref, mref_ref, mreft_ref, neginct_ref,
               neginc_ref, invb_ref, pbal_ref, qth_ref,
               x_out, y_out, zl_out, zu_out, bx_out, bs_out,
               M, ysc, dinv):
        dt = c_ref.dtype
        row_m = jax.lax.broadcasted_iota(jnp.int32, (mp, 1, 1), 0)
        col_m = jax.lax.broadcasted_iota(jnp.int32, (1, mp, 1), 1)
        eye_l = (jax.lax.broadcasted_iota(jnp.int32, (nl, nl, 1), 0)
                 == jax.lax.broadcasted_iota(jnp.int32, (nl, nl, 1), 1))
        colscale = colscale_ref[0]                       # [n, 128]
        bru = bru_ref[0]                                 # [nl, 128]
        cvec = c_ref[0]
        bvec = b_ref[0]                                  # [m, 128]
        lo = l_ref[0]
        up = u_ref[0]
        a0 = a0_ref[...]                                 # [nb, n]
        a0t = a0t_ref[...]
        mref = mref_ref[...]
        mreft = mreft_ref[...]
        neginct = neginct_ref[...]                       # [nb, nl]
        neginc = neginc_ref[...]                         # [nl, nb]
        invb = invb_ref[...]                             # [nl, 1]
        margin = 1e-9 * jnp.maximum(up - lo, 1e-12)

        def dot(a_, b_):
            return jnp.dot(a_, b_, preferred_element_type=jnp.float32
                           ).astype(dt)

        def mv_A(v):                                     # [n,128] -> [m,128]
            top = dot(a0, colscale * v)
            bot = (invb * v[f_lo:f_hi]
                   - bru * dot(mref, v[f_hi:]))
            return jnp.concatenate([top, bot], axis=0)

        def mtv_A(y):                                    # [m,128] -> [n,128]
            yb, yf = y[:nb], y[nb:]
            r = colscale * dot(a0t, yb)
            return jnp.concatenate([
                r[:f_lo],
                r[f_lo:f_hi] + invb * yf,
                r[f_hi:] - dot(mreft, bru * yf)], axis=0)

        def form_and_factor(d):
            """M = A diag(1/d) A' (equilibrated, regularized, padded to mp
            with an identity block), factored in place in the VMEM scratch
            by a right-looking Cholesky whose rank-1 trailing updates are
            restricted to the trailing rows via predicated 8-row strips
            (the factorization is VMEM-bandwidth-bound; skipping the
            already-final strips cuts its traffic ~2x — measured faster
            than rank-2/4/8 panel variants, whose multi-term updates cost
            one broadcast+FMA per term per element and so trade bandwidth
            for the same amount of VPU compute). Returns the equilibration
            scale s [mp, 128]."""
            wb = colscale * colscale / d                 # [n,128]
            w_f = wb[f_lo:f_hi]
            g = w_f * invb                               # [nl,128]
            if "form" in ablate:
                return jnp.ones((mp, LANES), dt)
            M[:nb, :nb, :] = dot(pbal_ref[...], wb).reshape(nb, nb, LANES)
            M[:nb, nb:m, :] = neginct[:, :, None] * g[None, :, :]
            M[nb:m, :nb, :] = neginc[:, :, None] * g[:, None, :]
            mtt = (dot(qth_ref[...], wb[f_hi:]).reshape(nl, nl, LANES)
                   * bru[:, None, :] * bru[None, :, :])
            M[nb:m, nb:m, :] = jnp.where(eye_l,
                                         mtt + (invb * g)[:, None, :], mtt)
            if mp > m:
                # Identity padding block: factors to itself, decoupled.
                M[m:, :, :] = jnp.broadcast_to(
                    jnp.where(row_m[m:] == col_m, 1.0, 0.0).astype(dt),
                    (mp - m, mp, LANES))
                M[:m, m:, :] = jnp.zeros((m, mp - m, LANES), dt)
            diag = jnp.sum(jnp.where(row_m == col_m, M[...], 0.0), axis=1)
            s = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))  # [mp,128]
            M[...] = (M[...] * s[:, None, :] * s[None, :, :]
                      + jnp.where(row_m == col_m, delta, 0.0))

            def chol_step(k, _):
                akk = M[pl.ds(k, 1), pl.ds(k, 1), :]
                # Same per-lane pivot floor as batched_chol: a pivot this
                # small means the lane lost positive definiteness to f32
                # cancellation; flooring keeps the factor bounded so the
                # quality guard (not garbage rows) decides the lane.
                inv = jax.lax.rsqrt(jnp.maximum(akk, PIVOT_FLOOR))
                ck = M[:, pl.ds(k, 1), :] * inv          # [mp,1,128]
                ck = jnp.where(row_m >= k, ck, 0.0)
                rk = M[pl.ds(k, 1), :, :] * inv          # [1,mp,128]
                rk = jnp.where(col_m > k, rk, 0.0)
                strict = jnp.where(row_m > k, ck, 0.0)
                # Trailing update restricted to rows > k via predicated
                # 8-row strips: the masks already make skipped strips
                # exact zeros, so the guards are a pure traffic
                # optimization (~m^3 -> m^3/2 VMEM bytes).
                for rb in range(mp // 8):
                    r0 = rb * 8

                    def upd(r0=r0):
                        M[r0:r0 + 8, :, :] = (
                            M[r0:r0 + 8, :, :]
                            - strict[r0:r0 + 8] * rk)

                    pl.when(k < r0 + 8)(upd)
                M[:, pl.ds(k, 1), :] = ck
                return 0

            if "chol" not in ablate:
                jax.lax.fori_loop(0, m, chol_step, 0)

            # Invert the 8x8 diagonal blocks of L once per factorization
            # (recursive triangular block inverse, log-depth — no serial
            # 8-step chain): the two Newton solves per iteration then
            # replace their serial in-block substitutions with single
            # vectorized matvecs. For lower-tri D = [[A,0],[C,B]]:
            # D^-1 = [[Ai, 0], [-Bi C Ai, Bi]].
            def mmk(a_, b_):                      # [k,k,128] @ [k,k,128]
                # Unrolled over the k<=4 contraction terms; stays rank-3.
                return sum(a_[:, p:p + 1, :] * b_[p:p + 1, :, :]
                           for p in range(a_.shape[1]))

            def inv_lower(Dk):
                k = Dk.shape[0]
                if k == 1:
                    return 1.0 / Dk
                h = k // 2
                Ai = inv_lower(Dk[:h, :h, :])
                Bi = inv_lower(Dk[h:, h:, :])
                off = -mmk(Bi, mmk(Dk[h:, :h, :], Ai))
                top = jnp.concatenate(
                    [Ai, jnp.zeros((h, k - h, LANES), Dk.dtype)], axis=1)
                return jnp.concatenate(
                    [top, jnp.concatenate([off, Bi], axis=1)], axis=0)

            if "solve" not in ablate:
                for rb in range(mp // 8):
                    r0 = rb * 8
                    dinv[r0:r0 + 8, :, :] = inv_lower(
                        M[r0:r0 + 8, r0:r0 + 8, :])
            return s

        def solve_M(s, rhs):
            """(s L L' s)^-1 rhs via the factored scratch. rhs is [m,128];
            the padded identity tail carries zeros.

            Blocked substitution with STATIC 8-row blocks (fully
            unrolled): each block first subtracts the already-solved
            prefix/suffix contribution in one [8, r0]-shaped pass (the
            classic trsm panel update), then applies the precomputed
            8x8 diagonal-block inverse as one vectorized matvec — the
            only serial dependency left is block-to-block."""
            if "solve" in ablate:
                return rhs
            ysc[0:m, :] = s[0:m] * rhs
            if mp > m:
                ysc[m:, :] = jnp.zeros((mp - m, LANES), rhs.dtype)
            nblk_s = mp // 8

            # forward: L y = rhs;  y_blk = Dinv_blk (rhs_blk - panel)
            for bb in range(nblk_s):
                r0 = bb * 8
                v = ysc[r0:r0 + 8, :]
                if r0 > 0:
                    lpan = M[r0:r0 + 8, 0:r0, :]          # [8, r0, 128]
                    v = v - jnp.sum(lpan * ysc[0:r0, :][None, :, :],
                                    axis=1)               # [8, 128]
                db = dinv[r0:r0 + 8, :, :]                # [8out, 8in, 128]
                ysc[r0:r0 + 8, :] = jnp.sum(db * v[None, :, :], axis=1)

            # backward: L' x = y;  x_blk = Dinv_blk' (y_blk - panel)
            for bb in range(nblk_s - 1, -1, -1):
                r0 = bb * 8
                v = ysc[r0:r0 + 8, :]
                if r0 + 8 < mp:
                    lpan = M[r0 + 8:, r0:r0 + 8, :]       # [rest, 8, 128]
                    v = v - jnp.sum(
                        lpan * ysc[r0 + 8:, :][:, None, :], axis=0)
                db = dinv[r0:r0 + 8, :, :]
                ysc[r0:r0 + 8, :] = jnp.sum(db * v[:, None, :], axis=0)

            return s[0:m] * ysc[0:m, :]

        def newton(s, d, sl, su, zl, zu, rd, rp, rcl, rcu):
            rhat = rd - rcl / sl + rcu / su
            dy = solve_M(s, rp + mv_A(rhat / d))
            dx = (mtv_A(dy) - rhat) / d
            dzl = (rcl - zl * dx) / sl
            dzu = (rcu + zu * dx) / su
            return dx, dy, dzl, dzu

        def max_step(sl, su, zl, zu, dx, dzl, dzu):
            big = jnp.asarray(1e30, dt)
            ap = jnp.minimum(
                jnp.min(jnp.where(dx < 0, -sl / jnp.minimum(dx, -1e-30),
                                  big), axis=0, keepdims=True),
                jnp.min(jnp.where(dx > 0, su / jnp.maximum(dx, 1e-30),
                                  big), axis=0, keepdims=True))
            ad = jnp.minimum(
                jnp.min(jnp.where(dzl < 0, -zl / jnp.minimum(dzl, -1e-30),
                                  big), axis=0, keepdims=True),
                jnp.min(jnp.where(dzu < 0, -zu / jnp.minimum(dzu, -1e-30),
                                  big), axis=0, keepdims=True))
            return (jnp.minimum(tau * ap, 1.0),
                    jnp.minimum(tau * ad, 1.0))         # [1,128] each

        # State lives in the (VMEM-resident) output refs across iterations:
        # a Mosaic loop carrying dozens of mixed-layout vregs fails to
        # legalize, but read-modify-write on refs is the native idiom.
        # `done` is kept as a 0/1 float mask inside dsc_ref[0:1].
        x0 = 0.5 * (lo + up)
        x_out[0] = x0
        y_out[0] = jnp.zeros((m, LANES), dt)
        zl_out[0] = jnp.ones((n, LANES), dt)
        zu_out[0] = jnp.ones((n, LANES), dt)
        bx_out[0] = x0
        bs_out[0, 0:1, :] = jnp.full((1, LANES), jnp.inf, dt)
        bs_out[0, 1:2, :] = jnp.zeros((1, LANES), dt)    # done mask

        def body(carry):
            i, _ = carry
            x = x_out[0]
            y = y_out[0]
            zl = zl_out[0]
            zu = zu_out[0]
            best_score = bs_out[0, 0:1, :]
            done = bs_out[0, 1:2, :]                     # 0/1 float

            sl = jnp.maximum(x - lo, 1e-12)
            su = jnp.maximum(up - x, 1e-12)
            if "resid" in ablate:
                rp = bvec - x[0:m]
                rd = cvec - zl + zu
            else:
                rp = bvec - mv_A(x)
                rd = cvec - mtv_A(y) - zl + zu
            mu = (jnp.sum(sl * zl + su * zu, axis=0, keepdims=True)
                  / (2 * n_total))                       # [1,128]

            score = mu + jnp.max(jnp.abs(rp), axis=0, keepdims=True)
            better = score < best_score
            bs_out[0, 0:1, :] = jnp.where(better, score, best_score)
            bx_out[0] = jnp.where(better, x, bx_out[0])

            done = jnp.maximum(done, (mu < mu_tol).astype(dt))

            d = jnp.clip(zl / sl + zu / su, 1e-6, 1e10)
            s = form_and_factor(d)

            centering = mu < center_tol                  # [1,128]

            if "affine" in ablate:
                dxa = d * 0.0
                dzla, dzua = dxa, dxa
                sigma = mu * 0.1
                gate = jnp.where(centering, 0.0, 1.0)
            else:
                dxa, dya, dzla, dzua = newton(
                    s, d, sl, su, zl, zu, rd, rp, -sl * zl, -su * zu)
                apa, ada = max_step(sl, su, zl, zu, dxa, dzla, dzua)
                mu_aff = (jnp.sum((sl + apa * dxa) * (zl + ada * dzla)
                                  + (su - apa * dxa) * (zu + ada * dzua),
                                  axis=0, keepdims=True) / (2 * n_total))
                sigma = jnp.where(
                    centering, 0.5,
                    jnp.clip((mu_aff / jnp.maximum(mu, 1e-12)) ** 3,
                             0.0, 1.0))
                gate = jnp.where(centering, 0.0, 1.0)

            rcl = sigma * mu - sl * zl - gate * dxa * dzla
            rcu = sigma * mu - su * zu + gate * dxa * dzua
            if "corrector" in ablate:
                dx, dzl, dzu = rcl * 0.01, rcl * 0.01, rcu * 0.01
                dy = rp * 0.01
                ap = jnp.ones((1, LANES), dt)
                ad = ap
            else:
                dx, dy, dzl, dzu = newton(s, d, sl, su, zl, zu, rd, rp,
                                          rcl, rcu)
                ap, ad = max_step(sl, su, zl, zu, dx, dzl, dzu)
            damp = jnp.where(centering, 0.9, 1.0)
            ap = damp * ap
            ad = damp * ad

            xn = jnp.clip(x + ap * dx, lo + margin, up - margin)
            yn = y + ad * dy
            zln = jnp.maximum(zl + ad * dzl, 1e-12)
            zun = jnp.maximum(zu + ad * dzu, 1e-12)

            finite = (jnp.all(jnp.isfinite(xn), axis=0, keepdims=True)
                      & jnp.all(jnp.isfinite(yn), axis=0, keepdims=True)
                      & jnp.all(jnp.isfinite(zln), axis=0, keepdims=True)
                      & jnp.all(jnp.isfinite(zun), axis=0, keepdims=True))
            done_new = jnp.maximum(done, 1.0 - finite.astype(dt))
            keep = done_new > 0.5
            bs_out[0, 1:2, :] = done_new
            x_out[0] = jnp.where(keep, x, xn)
            y_out[0] = jnp.where(keep, y, yn)
            zl_out[0] = jnp.where(keep, zl, zln)
            zu_out[0] = jnp.where(keep, zu, zun)
            # Whole-block early exit: a lane marked done is frozen (its
            # state never changes again), so once every lane in this
            # 128-lane block is done the remaining iterations are pure
            # no-ops — stop paying for them. Exactly equivalent to the
            # fixed-count loop (test_early_exit_keeps_hard_lane_among_easy
            # pins the one-slow-lane hazard).
            return i + 1, jnp.min(done_new) > 0.5

        if cfg.early_exit:
            jax.lax.while_loop(
                lambda c: jnp.logical_and(c[0] < iters,
                                          jnp.logical_not(c[1])),
                body, (jnp.int32(0), jnp.bool_(False)))
        else:
            def fixed_body(i, c):
                body((i, c))   # runs for its ref side effects only
                return c
            jax.lax.fori_loop(0, iters, fixed_body, 0)

    return kernel


def fused_ipm_iterations(st: LPStructure, colscale, br_up, c, b, l, u,
                         cfg: IPMConfig = IPMConfig(),
                         ablate: frozenset | None = None):
    """Run the full Mehrotra iteration loop in one fused Pallas kernel.

    Inputs are batch-major ([B, n] / [B, nl] / [B, m]); B must be a
    multiple of 128. Returns batch-major ``(x, y, zl, zu, best_score,
    best_x)`` — exactly the state the XLA loop in
    ``lp_ipm_batched.solve_box_lp_batched`` would carry out of its
    ``fori_loop``, for identical downstream polish.
    """
    dtype = jnp.dtype(cfg.dtype)
    n, m = st.n, st.m
    B = c.shape[0]
    assert B % LANES == 0, f"batch {B} not a multiple of {LANES}"
    nblk = B // LANES

    if ablate is None:
        # Legacy global hook: tolerated only when empty — a stray non-empty
        # module-level set would silently poison every later solve through
        # the jit cache (it is invisible to the cache key).
        assert not ABLATE, (
            "ops.ipm_fused.ABLATE is non-empty; pass ablate= explicitly "
            "to fused_ipm_iterations instead of mutating the global")
        ablate = frozenset()

    bm = lambda a: to_batch_minor(a.astype(dtype))
    kernel = _make_kernel((st.ng, st.nd, st.nl, st.nb), cfg, n, ablate)

    lane_spec = lambda rows: pl.BlockSpec(
        (1, rows, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shared_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((nblk, n, LANES), dtype),   # x
        jax.ShapeDtypeStruct((nblk, m, LANES), dtype),   # y
        jax.ShapeDtypeStruct((nblk, n, LANES), dtype),   # zl
        jax.ShapeDtypeStruct((nblk, n, LANES), dtype),   # zu
        jax.ShapeDtypeStruct((nblk, n, LANES), dtype),   # best_x
        jax.ShapeDtypeStruct((nblk, 2, LANES), dtype),   # [best_score; done]
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            lane_spec(n),            # colscale
            lane_spec(st.nl),        # br_up
            lane_spec(n),            # c
            lane_spec(m),            # b
            lane_spec(n),            # l
            lane_spec(n),            # u
            shared_spec(st.a0_bal.shape),
            shared_spec(st.a0_balT.shape),
            shared_spec(st.minc_ref.shape),
            shared_spec(st.minc_refT.shape),
            shared_spec(st.neg_incT.shape),
            shared_spec(st.neg_inc.shape),
            shared_spec(st.inv_b.shape),
            shared_spec(st.p_bal.shape),
            shared_spec(st.q_theta.shape),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, s.shape[1], LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM) for s in out_shapes),
        out_shape=tuple(out_shapes),
        scratch_shapes=[
            pltpu.VMEM((_padded_m(m), _padded_m(m), LANES), dtype),  # M / L
            pltpu.VMEM((_padded_m(m), LANES), dtype),    # solve workspace
            pltpu.VMEM((_padded_m(m), 8, LANES), dtype),  # diag-block invs
        ],
        interpret=_interpret(),
    )(bm(colscale), bm(br_up), bm(c), bm(b), bm(l), bm(u),
      st.a0_bal.astype(dtype), st.a0_balT.astype(dtype),
      st.minc_ref.astype(dtype), st.minc_refT.astype(dtype),
      st.neg_incT.astype(dtype), st.neg_inc.astype(dtype),
      st.inv_b.astype(dtype), st.p_bal.astype(dtype),
      st.q_theta.astype(dtype))

    x, y, zl, zu, bx, bs = (from_batch_minor(o) for o in outs)
    return x, y, zl, zu, bs[:, 0], bx
