"""Fused hardware-PRNG sampler + first-pass certificate (Pallas, TPU).

NEXT.md #17: the NSQ hot path's cost is HBM traffic, not compute —
every [B, n<=128] f32 intermediate of the jnp sample+certify graph
occupies a 128-lane-padded [B, 128] tile in HBM (134 MB per
intermediate at B=262144), and the measured certificate roof is
bandwidth-bound (HIGHEST vs HIGH matmul precision timed identical,
scripts/probe_certify_precision.py). This kernel holds one state tile
in VMEM end to end: it draws the Bernoulli outage indicators with the
core's hardware PRNG (no uniforms ever materialize), computes the exact
copper deficit, builds the shed/dispatch candidate, and performs the
LODF-corrected first-pass flow check — the path that certifies ~99.5%
of RTS-24 peak states. Only four arrays leave the kernel: the uint8
indicator matrix (consumed by the LP router, the moments, and component
importance), the f32 deficit, the first-pass certificate mask, and the
shed candidate.

STATUS (round 3, measured): kept OPT-IN as an engineering record —
the full fused step measures 0.72x the default hinted path (14.3M vs
19.9M median scen/s at B=262144, scripts/probe_fused_tier1.py).
Two structural reasons, recorded in NEXT.md #18: (a) deficit > 0
optima bind a line limit with exactly zero margin (all gens forced to
max at the copper bound), so the rounding guard band below MUST route
~7% of peak lanes to the f32 finish re-check no matter how the dots
are graded; (b) the kernel itself lowers to ~9 ms vs the hinted jnp
tier-1's ~10 ms (TILE-invariant; PRNG ~0.8 ms), so even a free finish
pass caps the win at ~1.2x. Correctness is proven (hardware parity:
sound subset, finish == certify_states exactly).

Why the two previous fused attempts lost and this one was expected to
win (NEXT.md #15/#16, kept in-tree): the fused certificate kernel ran every
dot at 6-pass HIGHEST precision and included the full repair descent +
Woodbury block (~40 matmuls of MXU-padding floor); the hw-PRNG sampler
kernel produced for an XLA consumer across a fusion barrier. Here the
kernel (a) absorbs its consumers, (b) runs only the ~12-matmul quick
path — repair, Woodbury rank-k and islanding rescue happen DOWNSTREAM
on a compacted ~0.5% lane buffer (``dcopf.certify_finish``), and (c)
grades matmul precision per dot:

- HIGHEST (6 MXU passes) for the sums that must be f32-exact because
  they feed the certified DNS bound or the candidate's power balance
  (capacity sum, dispatch rebalance totals);
- emulated bf16x3 "HIGH" (3 DEFAULT passes on an explicit hi/lo
  split, the lo@lo term dropped; <= ~2^-16 relative error) for
  injections and flows — Mosaic only lowers DEFAULT/HIGHEST in-kernel,
  so the 3-pass scheme is spelled out in ``dot()``;
- DEFAULT (1 pass, bf16 inputs) for quantities that only gate
  certification (bus-local dispatch fractions, the error-bound
  matmuls, violation counts over exact 0/1 masks).

Soundness (the guard band): a lane is certified here only if every
LODF-corrected post-outage flow clears its limit by more than a
per-lane, per-line rigorous bound on the kernel's own rounding:

  |flows_kernel - flows_f32| <= EPS_HIGH * (|inj| @ |ptdf|.T)
  |post_kernel  - post_f32 | <= bound_f
        + (br_down*(EPS_HIGH*|flows| + 1.01*bound_f)) @ |lodf|.T

with EPS_HIGH = 2^-14, a ~4x inflation of the emulated-bf16x3 error
model (the dropped lo*lo term is <= 2^-16 |a||b|, the two kept cross
terms accumulate in f32; the DEFAULT-precision bound matmuls are
themselves inflated by the 1.01 factor, and the bound is computed from
|.| inputs so its own rounding can only grow it on the dominant term). Lanes inside the
band are NOT certified — they fall to ``certify_finish``'s f32 re-check
(same tolerance as the jnp path), so the band costs a compacted-lane
re-check, never a wrong certificate. Islanding outages (LODF sentinel
1e6 columns) get a huge bound and always take the finish path, whose
exact zero-flow test decides them as before.

Sampling semantics match ``ops.hw_sampler`` (same thresholds: P(fail)
= ceil(U * 2^24)/2^24, pinned components threshold 0; same Weyl-mixed
per-tile seeding SCHEME — but TILE here is 512 vs hw_sampler's 4096,
so the per-tile seeds cover different row ranges and the same key
yields a DIFFERENT state stream than ``sample_states_hw``). A run is
deterministic for a fixed (key, batch, backend) but is a different
stream than both threefry and hw_sampler — the study keeps threefry
as the reproducibility contract and enables this path opt-in
(MCSConfig, bench.py).

Scope: single-128-block systems (n_comp, n_bus, n_branch, n_gen,
n_load all <= 128 — RTS-24-class) and a batch-constant load row (NSQ
peak studies). Other regimes keep the jnp path.

Replaces the reference's per-state MATPOWER solves (nsqMain.m:257-263,
mc_sampling.m:24-45) as the tier-1 screen of that hot loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from powersystemsreliabilityassessment_tpu.ops import hw_sampler

TILE = 512

# Guard-band constant for HIGH-precision (bf16x3) dots; see module
# docstring for the error model it inflates ~4x.
EPS_HIGH = 2.0 ** -14

_HIGHEST = jax.lax.Precision.HIGHEST
_HIGH = jax.lax.Precision.HIGH
_DEFAULT = jax.lax.Precision.DEFAULT


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supported(sys) -> bool:
    """Kernel applicability: one 128-lane block per quantity."""
    return max(sys.n_comp, sys.n_bus, sys.n_branch, sys.n_gen,
               sys.n_load) <= 128


def _make_kernel(ng: int, nd: int, nl: int, ncomp: int, c_pad: int,
                 gen_rng: bool):
    def dot(a, b, precision):
        if precision is _HIGH:
            # Mosaic supports only DEFAULT/HIGHEST in-kernel dot
            # precisions; emulate the 3-pass bf16x3 scheme explicitly
            # (hi@hi + hi@lo + lo@hi, dropping the lo@lo term whose
            # magnitude is <= 2^-16 |a||b| — inside the EPS_HIGH band).
            bf = jnp.bfloat16
            a_hi = a.astype(bf)
            a_lo = (a - a_hi.astype(jnp.float32)).astype(bf)
            b_hi = b.astype(bf)
            b_lo = (b - b_hi.astype(jnp.float32)).astype(bf)
            d = lambda x, y: jax.lax.dot(
                x, y, precision=_DEFAULT,
                preferred_element_type=jnp.float32)
            return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
        return jax.lax.dot(a, b, precision=precision,
                           preferred_element_type=jnp.float32)

    def kernel(scal_ref, seed_ref, thresh_or_down_ref, load_ref,
               hint_ref, loadbus_ref, pmax_ref, lohT_ref, gboh_ref,
               gbohT_ref, ptdfT_ref, absptdfT_ref, lodfT_ref,
               abslodfT_ref, rate_ref,
               down_ref, cert_ref, def_ref, shed_ref):
        f32 = jnp.float32
        load_tot = scal_ref[0]
        pmax_tot = scal_ref[1]

        def rowsum(x):
            # Lane-axis f32 reduction on the VPU: at most 128 sequential
            # f32 adds (relative error <= 128 * 2^-24 ~ 7.6e-6), at
            # least as faithful as the HIGHEST ones-vector dot it
            # replaces and ~6 MXU passes cheaper per use.
            return jnp.sum(x, axis=1, keepdims=True)

        if gen_rng:
            # Hardware PRNG, seeded exactly like ops.hw_sampler._kernel
            # (two key words; tile index Weyl-mixed into the second).
            tile_mix = seed_ref[1] ^ (pl.program_id(0)
                                      * np.int32(-1640531527))
            pltpu.prng_seed(seed_ref[0], tile_mix)
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((down_ref.shape[0], c_pad)),
                jnp.int32)
            draw = jax.lax.shift_right_logical(bits, 32 - hw_sampler._BITS)
            down_b = draw < thresh_or_down_ref[...]
        else:
            # Explicit states arrive as f32 0/1 (Mosaic has no
            # uint8 -> f32 cast; going through the bool keeps every
            # cast in the supported set).
            down_b = thresh_or_down_ref[...] > 0.5
        down_ref[...] = down_b.astype(jnp.uint8)
        down = jnp.where(down_b, 1.0, 0.0).astype(f32)     # [T, c_pad]
        gen_down = down[:, :ng]                            # [T, ng]
        br_down = down[:, ng:ncomp]                        # [T, nl]
        gen_up = 1.0 - gen_down

        # Exact copper deficit: cap = pmax_tot - sum(down_g * pmax_g),
        # an f32 VPU row reduction — it IS the certified DNS bound.
        pmax_row = pmax_ref[...]                           # [1, ng]
        cap = pmax_tot - rowsum(gen_down * pmax_row)
        deficit = jnp.maximum(load_tot - cap, 0.0)         # [T, 1]

        # Hint-directed shed candidate at exactly the copper bound
        # (dcopf.calibrate_shed_hint pattern; the caller passes
        # load/load_tot when no hint exists, which reproduces the
        # load-proportional candidate). Clip to per-load caps, then
        # rebalance the clipped residual into the remaining headroom —
        # the single-pass up-branch of dcopf._rebalance_shed (the
        # clip only ever REMOVES shed, so resid <= 0 and sum(load) -
        # sum(cand0) >= deficit - tot guarantees no stranding).
        load_row = load_ref[...]                           # [1, nd]
        cand0 = jnp.minimum(hint_ref[...] * deficit, load_row)
        tot0 = rowsum(cand0)                               # [T, 1]
        head_l = load_row - cand0
        head_lt = jnp.maximum(rowsum(head_l), 1e-9)
        cand = jnp.minimum(cand0 + head_l * ((deficit - tot0) / head_lt),
                           load_row)                       # [T, nd]
        served = load_tot - deficit                        # [T, 1]

        # Locally self-balancing dispatch (dcopf._dispatch_candidate).
        # The fractions only shape the candidate (gates certification),
        # so their dots run 1-pass; the rebalance TOTALS keep the
        # candidate's power balance and ride f32 row reductions.
        gen_cap = pmax_row * gen_up                        # [T, ng]
        served_bus = dot(load_row - cand, lohT_ref[...], _DEFAULT)
        cap_bus = dot(gen_cap, gbohT_ref[...], _DEFAULT)   # [T, nb]
        local_frac = jnp.minimum(
            served_bus / jnp.maximum(cap_bus, 1e-9), 1.0)
        disp_local = gen_cap * dot(local_frac, gboh_ref[...], _DEFAULT)
        total = rowsum(disp_local)                         # [T, 1]
        resid = total - served
        down_scale = jnp.where(
            total > 1e-9,
            jnp.maximum(served, 0.0) / jnp.maximum(total, 1e-9), 0.0)
        headroom = jnp.maximum(gen_cap - disp_local, 0.0)
        head_tot = jnp.maximum(rowsum(headroom), 1e-9)
        up = disp_local + headroom * ((-resid) / head_tot)
        dispatch = jnp.where(resid >= 0, disp_local * down_scale,
                             jnp.minimum(up, gen_cap))     # [T, ng]

        # Injections and flows at HIGH (bf16x3); the one-hot incidence
        # matrices are exact in bf16, so the only rounding is on the
        # dispatch/shed/injection values themselves (~2^-17 relative).
        inj = (dot(dispatch, gbohT_ref[...], _HIGH)
               + dot(cand, lohT_ref[...], _HIGH)
               - loadbus_ref[...])                         # [T, nb]
        flows = dot(inj, ptdfT_ref[...], _HIGH)            # [T, nl]
        bound_f = EPS_HIGH * dot(jnp.abs(inj), absptdfT_ref[...],
                                 _DEFAULT)                 # [T, nl]

        # LODF-corrected post-outage flows (rank-1; exact for
        # n_out <= 1) plus the propagated error bound.
        g = dot(br_down * flows, lodfT_ref[...], _HIGH)
        post = (flows + g) * (1.0 - br_down)
        bound_g = dot(br_down * (EPS_HIGH * jnp.abs(flows)
                                 + 1.01 * bound_f),
                      abslodfT_ref[...], _DEFAULT)
        bound_post = 1.01 * (bound_f + bound_g)

        # Certify only with margin beyond the rounding bound. viol is an
        # exact 0/1 mask, so its f32 row count is exact.
        rate_row = rate_ref[...]                           # [1, nl]
        viol = jnp.where(jnp.abs(post) > rate_row + 1e-4 - bound_post,
                         1.0, 0.0).astype(f32)
        nviol = rowsum(viol)                               # [T, 1]
        n_out = rowsum(br_down)                            # [T, 1]
        ok1 = (nviol < 0.5) & (n_out <= 1.5)

        cert_ref[...] = jnp.where(ok1, 1.0, 0.0).astype(f32)
        def_ref[...] = deficit
        shed_ref[...] = cand

    return kernel


@functools.partial(jax.jit, static_argnames=("ng", "nd", "nl", "nb",
                                             "ncomp", "batch", "gen_rng"))
def _call_kernel(seeds, thresh_or_down, scal, load_row, hint_row,
                 loadbus_row, pmax_row, lohT, gboh, gbohT, ptdfT,
                 absptdfT, lodfT, abslodfT, rate_row, *, ng, nd, nl, nb,
                 ncomp, batch, gen_rng):
    c_pad = max(128, -(-ncomp // 128) * 128)
    Bp = -(-batch // TILE) * TILE
    dt = jnp.float32

    if gen_rng:
        first_spec = pl.BlockSpec((1, c_pad), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
        first_arg = thresh_or_down
    else:
        first_spec = pl.BlockSpec((TILE, c_pad), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        first_arg = thresh_or_down
        if first_arg.shape[0] != Bp:
            first_arg = jnp.pad(
                first_arg, ((0, Bp - first_arg.shape[0]), (0, 0)))

    shared = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    tile_out = lambda w, d: pl.BlockSpec((TILE, w), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((Bp, c_pad), jnp.uint8),      # down
        jax.ShapeDtypeStruct((Bp, 1), dt),                 # cert1
        jax.ShapeDtypeStruct((Bp, 1), dt),                 # deficit
        jax.ShapeDtypeStruct((Bp, nd), dt),                # shed
    )
    kernel = _make_kernel(ng, nd, nl, ncomp, c_pad, gen_rng)
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),         # seeds
            first_spec,                                    # thresh | down
            shared((1, nd)),                               # load_row
            shared((1, nd)),                               # hint_row
            shared((1, nb)),                               # load_bus_row
            shared((1, ng)),                               # pmax_row
            shared((nd, nb)),                              # load_onehot.T
            shared((nb, ng)),                              # gen_bus_onehot
            shared((ng, nb)),                              # gen_bus_onehot.T
            shared((nb, nl)),                              # ptdf.T
            shared((nb, nl)),                              # |ptdf|.T
            shared((nl, nl)),                              # lodf.T
            shared((nl, nl)),                              # |lodf|.T
            shared((1, nl)),                               # br_rate
        ],
        out_specs=(
            pl.BlockSpec((TILE, c_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            tile_out(1, dt), tile_out(1, dt), tile_out(nd, dt),
        ),
        out_shape=out_shapes,
        interpret=_interpret(),
    )(scal, seeds, first_arg, load_row, hint_row, loadbus_row, pmax_row,
      lohT, gboh, gbohT, ptdfT, absptdfT, lodfT, abslodfT, rate_row)
    return outs


def sample_certify_quick(key, sys, batch: int,
                         down: jax.Array | None = None,
                         shed_hint: jax.Array | None = None):
    """Draw ``batch`` NSQ states and first-pass-certify them, fused.

    Returns ``(down_u8 [batch, n_comp], ok1 [batch] bool,
    deficit [batch] f32, shed [batch, n_load] f32)``. Pass ``down``
    (bool/uint8 [batch, n_comp]) to skip the in-kernel PRNG and certify
    an explicit state batch — the parity-test mode, and the only mode
    available off-TPU (interpret mode has no hardware PRNG).

    ``shed_hint`` ([n_load], sums to 1; ``dcopf.calibrate_shed_hint``)
    directs the in-kernel shed candidate; omitted, the candidate is
    load-proportional. With the hint the quick pass certifies ~98.9%
    of peak lanes instead of ~91.8%, shrinking the finish buffer.

    The certificate here is FIRST-PASS only: repair, rank-k Woodbury
    and islanding rescue run downstream on the uncertified lanes
    (``dcopf.certify_finish``). The load is the batch-constant NSQ peak
    (``sys.load_pd``).
    """
    assert supported(sys), "fused sampler-certificate: system exceeds " \
        "one 128-lane block; use the jnp path"
    ng, nd, nl, nb = sys.n_gen, sys.n_load, sys.n_branch, sys.n_bus
    ncomp = sys.n_comp
    c_pad = max(128, -(-ncomp // 128) * 128)
    dt = jnp.float32

    gen_rng = down is None
    if gen_rng:
        kd = jax.random.key_data(key)
        if kd.shape != (2,):
            raise ValueError(
                f"fused sampler requires a 2-word (threefry) key; got "
                f"key_data shape {kd.shape}")
        seeds = kd.astype(jnp.uint32).astype(jnp.int32)
        first = hw_sampler.bernoulli_thresholds(
            sys.unavail, sys.always_up_nsq, c_pad)
    else:
        seeds = jnp.zeros((2,), jnp.int32)
        first = jnp.pad(down.astype(dt),
                        ((0, 0), (0, c_pad - ncomp)))

    load_row = sys.load_pd.astype(dt)[None, :]
    if shed_hint is None:
        hint_row = load_row / jnp.sum(load_row)
    else:
        hint_row = jnp.asarray(shed_hint, dt)[None, :]
    loadbus_row = (sys.load_pd @ sys.load_onehot.T).astype(dt)[None, :]
    scal = jnp.stack([jnp.sum(sys.load_pd.astype(dt)),
                      jnp.sum(sys.gen_pmax.astype(dt))])
    a = lambda x: jnp.asarray(x, dt)
    down_u8, cert1, deficit, shed = _call_kernel(
        seeds, first, scal, load_row, hint_row, loadbus_row,
        a(sys.gen_pmax)[None, :], a(sys.load_onehot).T,
        a(sys.gen_bus_onehot), a(sys.gen_bus_onehot).T, a(sys.ptdf).T,
        jnp.abs(a(sys.ptdf)).T, a(sys.lodf).T, jnp.abs(a(sys.lodf)).T,
        a(sys.br_rate)[None, :],
        ng=ng, nd=nd, nl=nl, nb=nb, ncomp=ncomp, batch=batch,
        gen_rng=gen_rng)
    return (down_u8[:batch, :ncomp], cert1[:batch, 0] > 0.5,
            deficit[:batch, 0], shed[:batch])
