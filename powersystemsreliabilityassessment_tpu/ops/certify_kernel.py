"""Pallas-fused Tier-1 optimality-certificate kernel (EXPERIMENT:
measured SLOWER than XLA — kept for the parity infrastructure and the
negative result; the production path remains dcopf.certify_states).

Hypothesis: ``certify_states`` dominates the headline bench once the LP
fraction is screened to ~0.04% (certify ~5.9 ms of the ~10 ms
sample+certify step at B=262144), and the jnp graph materializes dozens
of [B, n_branch]-class intermediates in HBM — so a kernel holding a
state tile in VMEM across the whole certificate (copper deficit,
locally-balanced dispatch, LODF check, 3 repair passes, rank-2 Woodbury)
should win on bandwidth (~45x less HBM traffic).

Measured on TPU v5e (scripts/probe_certify_fused.py, 2026-08-18,
B=262144, TILE=512): **sample+certify 17.7 ms fused vs 9.9 ms jnp** —
the fused kernel is 2.3x slower despite perfect agreement (1.0 certified
agreement, deficit maxdiff 3.8e-6). Why: every certificate matmul has
K, N <= n_branch = 38, so inside the kernel each dot pads to full
128x128 MXU passes per 128 rows — ~40 matmuls x B/128 passes ~= 11 ms
of pure MXU-padding floor — while XLA lowers the same small-K graph to
a bandwidth-bound form (~5.9 ms incl. the repair loop). Lesson recorded:
at these operator shapes (K,N << 128, B huge) HBM traffic through XLA
fusion beats VMEM residency through MXU padding; the fused-IPM kernel
(ops/ipm_fused.py) wins the opposite trade because its state REUSE per
byte is ~iterations x higher and its matmuls share one [m, 128] shape.
TILE=1024 additionally exceeds the 16 MB scoped-VMEM budget (19.8 MB).

The math mirrors ``certify_states`` statement-for-statement (same
epsilons, same rebalance operators, same eligibility rules) — the only
intended differences are float32 reassociation (sum-reductions instead
of dot-with-ones) and one-hot construction via min-index instead of
argmax (identical selections for the n_out == 2 lanes that consume
them). Certificates remain *self-verifying*: a lane is certified only if
its own candidate passes the exact post-outage flow check computed here,
so a numeric deviation from the jnp path can flip a borderline lane to
the LP but never certify an infeasible candidate beyond f32 roundoff —
the same contract the jnp path carries (verified in
tests/test_certify_kernel.py against the jnp path and the f64 oracles;
exhaustive N-0/1/2 parity re-run in scripts/parity_n2_exhaustive.py).

Replaces the reference's implicit screening (it has none — MATPOWER
MIPS solves every sampled state, nsqMain.m:257-263); the certificate
concept itself is this framework's TPU-first redesign of that hot loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# States per grid step. Lanes pad each [TILE, <=71] array to 128 wide
# (TILE=512 -> 256 KB each); Mosaic's scoped-VMEM stack for the kernel
# measured 19.8 MB at TILE=1024 (over the 16 MB budget) and fits at 512.
TILE = 512


def _rebalance(cand, caps, target):
    """Kernel-side mirror of dcopf._rebalance_shed (keepdims layout)."""
    total = jnp.sum(cand, axis=1, keepdims=True)
    resid = total - target
    down_scale = jnp.where(
        total > 1e-9, jnp.maximum(target, 0.0) / jnp.maximum(total, 1e-9),
        0.0)
    headroom = jnp.maximum(caps - cand, 0.0)
    head_tot = jnp.maximum(jnp.sum(headroom, axis=1, keepdims=True), 1e-9)
    up = cand + headroom * ((-resid) / head_tot)
    return jnp.where(resid >= 0, cand * down_scale, jnp.minimum(up, caps))


def _make_kernel(ng: int, nd: int, nl: int, nb: int, repair_iters: int):
    def kernel(cd_ref, load_ref, pmax_ref, lohT_ref, gboh_ref, gbohT_ref,
               ptdfT_ref, ptdf_gen_ref, ptdf_load_ref, lodf_ref, lodfT_ref,
               transfer_ref, transferT_ref, rate_ref,
               cert_ref, def_ref, shed_ref, disp_ref):
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        cd = cd_ref[...]                                   # [T, ncomp]
        load_pu = load_ref[...]                            # [T, nd]
        gen_up = 1.0 - cd[:, :ng]
        br_down = cd[:, ng:]
        pmax = pmax_ref[...]                               # [1, ng]
        gen_cap = pmax * gen_up                            # [T, ng]
        cap = jnp.sum(gen_cap, axis=1, keepdims=True)      # [T, 1]
        load_tot = jnp.sum(load_pu, axis=1, keepdims=True)
        deficit = jnp.maximum(load_tot - cap, 0.0)

        # Load-proportional shed candidate at exactly the copper bound.
        prop = load_pu * (deficit / jnp.maximum(load_tot, 1e-9))
        cand = jnp.minimum(prop, load_pu)
        served = load_tot - deficit
        cand = _rebalance(cand, load_pu, deficit)

        # Locally self-balancing dispatch (dcopf.certify_states:293-304).
        lohT = lohT_ref[...]                               # [nd, nb]
        gboh = gboh_ref[...]                               # [nb, ng]
        gbohT = gbohT_ref[...]                             # [ng, nb]
        served_bus = dot(load_pu - cand, lohT)             # [T, nb]
        cap_bus = dot(gen_cap, gbohT)                      # [T, nb]
        local_frac = jnp.minimum(
            served_bus / jnp.maximum(cap_bus, 1e-9), 1.0)
        disp_local = gen_cap * dot(local_frac, gboh)
        dispatch = _rebalance(disp_local, gen_cap, served)

        ptdfT = ptdfT_ref[...]                             # [nb, nl]
        load_bus = dot(load_pu, lohT)                      # [T, nb]

        def flows_full(disp, shed):
            inj = dot(disp, gbohT) + dot(shed, lohT) - load_bus
            return dot(inj, ptdfT)                         # [T, nl]

        rate = rate_ref[...]                               # [1, nl]
        rate_ok = rate + 1e-4
        lodfT = lodfT_ref[...]

        def post_flows(f):
            return (f + dot(br_down * f, lodfT)) * (1.0 - br_down)

        def okmask(p):                                     # [T, 1] bool
            return jnp.max(jnp.abs(p) - rate_ok, axis=1,
                           keepdims=True) <= 0.0

        flows = flows_full(dispatch, cand)
        n_out = jnp.sum(br_down, axis=1, keepdims=True)
        eligible = n_out <= 1.0
        best_ok = okmask(post_flows(flows))

        # Repair descent on the LODF-corrected post-outage flows
        # (dcopf.certify_states:336-384, same step rules and clips).
        lodf = lodf_ref[...]
        ptdf_gen = ptdf_gen_ref[...]                       # [nl, ng]
        ptdf_load = ptdf_load_ref[...]                     # [nl, nd]
        best_shed, best_disp = cand, dispatch
        cur_shed, cur_disp, cur_post = cand, dispatch, post_flows(flows)
        for _ in range(repair_iters):
            over = jnp.maximum(jnp.abs(cur_post) - rate, 0.0)
            sgn_over = jnp.sign(cur_post) * over
            w = sgn_over + br_down * dot(sgn_over, lodf)
            grad_g = dot(w, ptdf_gen)
            grad_g = grad_g - jnp.mean(grad_g, axis=1, keepdims=True)
            step_g = (jnp.sum(over, axis=1, keepdims=True)
                      / jnp.maximum(jnp.max(jnp.abs(grad_g), axis=1,
                                            keepdims=True), 1e-9))
            disp_t = jnp.clip(cur_disp - step_g * grad_g, 0.0, gen_cap)
            disp_t = _rebalance(disp_t, gen_cap, served)
            grad = dot(w, ptdf_load)
            grad = grad - jnp.mean(grad, axis=1, keepdims=True)
            step_sz = (deficit
                       / jnp.maximum(jnp.max(jnp.abs(grad), axis=1,
                                             keepdims=True), 1e-9))
            trial = jnp.clip(cur_shed - step_sz * grad, 0.0, load_pu)
            trial = _rebalance(trial, load_pu, deficit)
            post_t = post_flows(flows_full(disp_t, trial))
            ok_trial = okmask(post_t)
            newly = (~best_ok) & ok_trial & eligible
            best_shed = jnp.where(newly, trial, best_shed)
            best_disp = jnp.where(newly, disp_t, best_disp)
            best_ok = best_ok | ok_trial
            cur_shed, cur_disp, cur_post = trial, disp_t, post_t

        certified = eligible & best_ok

        # Rank-2 Woodbury N-2 check (dcopf.certify_states:394-427).
        # One-hot selectors by min-index over the outage columns (equal
        # to argmax-of-binary's first-set-bit for the n_out == 2 lanes
        # that consume them).
        col_i = jax.lax.broadcasted_iota(jnp.int32, (1, nl), 1)
        is_dn = br_down > 0.5
        idx1 = jnp.where(is_dn, col_i, nl)
        k1 = jnp.min(idx1, axis=1, keepdims=True)
        h1 = ((col_i == k1) & is_dn).astype(jnp.float32)
        idx2 = jnp.where(is_dn & (col_i != k1), col_i, nl)
        k2 = jnp.min(idx2, axis=1, keepdims=True)
        h2 = ((col_i == k2) & is_dn).astype(jnp.float32)
        transfer = transfer_ref[...]
        transferT = transferT_ref[...]
        row1 = dot(h1, transfer)                           # [T, nl]
        row2 = dot(h2, transfer)
        a11 = jnp.sum(row1 * h1, axis=1, keepdims=True)
        a12 = jnp.sum(row1 * h2, axis=1, keepdims=True)
        a21 = jnp.sum(row2 * h1, axis=1, keepdims=True)
        a22 = jnp.sum(row2 * h2, axis=1, keepdims=True)
        f1 = jnp.sum(flows * h1, axis=1, keepdims=True)
        f2 = jnp.sum(flows * h2, axis=1, keepdims=True)
        e11, e12, e21, e22 = 1.0 - a11, -a12, -a21, 1.0 - a22
        det = e11 * e22 - e12 * e21
        nonsing = jnp.abs(det) > 1e-5
        safe_det = jnp.where(nonsing, det, 1.0)
        c1 = (e22 * f1 - e12 * f2) / safe_det
        c2 = (-e21 * f1 + e11 * f2) / safe_det
        post2 = (flows + dot(c1 * h1 + c2 * h2, transferT)) * (1.0 - br_down)
        pair_ok = (n_out == 2.0) & nonsing & okmask(post2)
        certified = certified | pair_ok

        cert_ref[...] = certified.astype(jnp.float32)
        def_ref[...] = deficit
        shed_ref[...] = best_shed
        disp_ref[...] = best_disp

    return kernel


def certify_states_fused(sys, comp_down: jax.Array, load_pu: jax.Array,
                         repair_iters: int = 3):
    """Drop-in fused version of ``dcopf.certify_states``.

    Returns the same ``Certificate`` named tuple. Not the production
    path (measured 2.3x slower than the jnp graph on TPU — see module
    docstring); on non-TPU backends it runs through the Pallas
    interpreter, op-by-op, for the parity tests only.
    """
    from powersystemsreliabilityassessment_tpu.engines.dcopf import (
        Certificate)

    B = comp_down.shape[0]
    ng, nd = sys.n_gen, sys.n_load
    nl, nb = sys.n_branch, sys.n_bus
    ncomp = ng + nl
    dt = jnp.float32

    Bp = ((B + TILE - 1) // TILE) * TILE
    cd = comp_down.astype(dt)
    lp = load_pu.astype(dt)
    if Bp != B:
        # Padding lanes are intact zero-load states: certified, deficit 0.
        cd = jnp.pad(cd, ((0, Bp - B), (0, 0)))
        lp = jnp.pad(lp, ((0, Bp - B), (0, 0)))

    kernel = _make_kernel(ng, nd, nl, nb, repair_iters)
    tile_spec = lambda w: pl.BlockSpec((TILE, w), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    shared = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((Bp, 1), dt),     # certified (0/1)
        jax.ShapeDtypeStruct((Bp, 1), dt),     # deficit
        jax.ShapeDtypeStruct((Bp, nd), dt),    # shed
        jax.ShapeDtypeStruct((Bp, ng), dt),    # dispatch
    ]
    a = lambda x: jnp.asarray(x, dt)
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // TILE,),
        in_specs=[
            tile_spec(ncomp),                  # comp_down
            tile_spec(nd),                     # load_pu
            shared((1, ng)),                   # gen_pmax
            shared((nd, nb)),                  # load_onehot.T
            shared((nb, ng)),                  # gen_bus_onehot
            shared((ng, nb)),                  # gen_bus_onehot.T
            shared((nb, nl)),                  # ptdf.T
            shared((nl, ng)),                  # ptdf @ gen_bus_onehot
            shared((nl, nd)),                  # ptdf @ load_onehot
            shared((nl, nl)),                  # lodf
            shared((nl, nl)),                  # lodf.T
            shared((nl, nl)),                  # br_transfer
            shared((nl, nl)),                  # br_transfer.T
            shared((1, nl)),                   # br_rate
        ],
        out_specs=tuple(
            pl.BlockSpec((TILE, s.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for s in out_shapes),
        out_shape=tuple(out_shapes),
        interpret=_interpret(),
    )(cd, lp, a(sys.gen_pmax)[None, :], a(sys.load_onehot).T,
      a(sys.gen_bus_onehot), a(sys.gen_bus_onehot).T, a(sys.ptdf).T,
      a(sys.ptdf @ sys.gen_bus_onehot),
      a(sys.ptdf @ sys.load_onehot), a(sys.lodf), a(sys.lodf).T,
      a(sys.br_transfer), a(sys.br_transfer).T, a(sys.br_rate)[None, :])

    cert, deficit, shed, disp = outs
    return Certificate(certified=cert[:B, 0] > 0.5, deficit=deficit[:B, 0],
                       shed=shed[:B], dispatch=disp[:B])
