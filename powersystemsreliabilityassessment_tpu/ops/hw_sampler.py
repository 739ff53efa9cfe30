"""Hardware-PRNG Bernoulli state sampler (TPU Pallas kernel).

MEASURED DEAD END for the production step — kept as a working option
and a record (same policy as ops/certify_kernel.py). Interleaved
same-process A/B on the full bench step (B=262144, 2026-08-19):
threefry 22.4M scen/s median vs hw 17.6M. In isolation the two samplers
tie near the dispatch floor (hw 3.65 vs threefry 4.45 ms best), but in
the full program the ``pallas_call`` is a fusion BARRIER: the [B, 128]
uint8 indicator matrix must round-trip HBM (write + slice-copy + read),
while XLA fuses the threefry bit generation directly into the
certificate's consumers so the uniforms never fully materialize. Rule
recorded: on TPU, replacing a fusable producer with a Pallas kernel
only pays if the kernel absorbs its consumers too (cf. the identical
lesson from the fused certificate kernel, NEXT.md #15).

Original motivation: the NSQ hot loop draws a ``[batch, n_comp]``
Bernoulli matrix per step (mc_sampling.m:24-45 draws ``rand < U``), and
the software threefry draw looked like ~1/3 of the bench step. This
kernel generates the bits with the TPU core's built-in hardware PRNG
(``pltpu.prng_seed`` / ``pltpu.prng_random_bits``) instead — no
20-round cipher on the VPU, only the uint8 indicator matrix in HBM.

Exactness: each component fails iff its 24-bit hardware draw is below
``ceil(U * 2^24)`` — probabilities quantize to the 2^-24 grid (vs the
2^-23 grid of ``jax.random.uniform``'s float32 output, which carries 23
random mantissa bits; the two quantizations differ by at most 2^-23).
``ceil`` guarantees P(fail) > 0 whenever U > 0 — ultra-rare components
are never silently pinned by rounding-to-zero.
Pinned (always-up) components get threshold 0 and can never fail. The
stream is a different (hardware) PRNG than threefry, so same-seed
results differ from :func:`sampling.state.sample_states`; the estimator
distribution is identical. Threefry remains the default study path (its
counter-based stream is the reproducibility contract); the hardware
sampler is the throughput path, opt-in via ``rng_impl="hw"``.

Seeding: the kernel seeds the per-core PRNG with the study key's two
words plus the grid tile index, so tiles are decorrelated and a run is
deterministic for a fixed (key, batch, backend).

Non-TPU backends (the CPU test mesh) have no hardware PRNG — callers
fall back to the threefry path (see ``sampling.state.sample_states``'s
``rng_impl`` argument).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# States per grid step. The only VMEM block is [TILE, 128] uint8 (+ the
# [TILE, 128] int32 bits in registers/scratch): 512 KB at TILE=4096 —
# far under budget even double-buffered.
TILE = 4096

_BITS = 24
_SCALE = float(1 << _BITS)


def bernoulli_thresholds(unavail: jax.Array, always_up: jax.Array,
                         n_pad: int) -> jax.Array:
    """[1, n_pad] int32 thresholds: P(fail) = ceil(U * 2^24) / 2^24.

    ``ceil`` keeps P(fail) > 0 for every U > 0 (round() would pin any
    U < 2^-25 to never-fail). Pinned and padded components get 0 (a
    24-bit draw is never < 0).
    """
    n = unavail.shape[0]
    t = jnp.ceil(unavail.astype(jnp.float32) * _SCALE).astype(jnp.int32)
    t = jnp.clip(t, 0, 1 << _BITS)
    t = jnp.where(always_up, 0, t)
    return jnp.pad(t, (0, n_pad - n))[None, :]


def _kernel(seed_ref, thresh_ref, out_ref):
    # Mosaic accepts at most 2 seed words — mix the tile index into the
    # second with a Weyl constant so tiles get decorrelated streams.
    tile_mix = seed_ref[1] ^ (pl.program_id(0) * np.int32(-1640531527))
    pltpu.prng_seed(seed_ref[0], tile_mix)
    bits = pltpu.bitcast(pltpu.prng_random_bits(out_ref.shape), jnp.int32)
    draw = jax.lax.shift_right_logical(bits, 32 - _BITS)
    out_ref[...] = (draw < thresh_ref[...]).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("batch",))
def sample_states_hw(key: jax.Array, unavail: jax.Array,
                     always_up: jax.Array, batch: int) -> jax.Array:
    """Hardware-PRNG equivalent of ``sampling.state.sample_states``.

    Returns bool [batch, n_comp]. TPU only — callers must route other
    backends to the threefry path.
    """
    n = unavail.shape[0]
    n_pad = max(128, -(-n // 128) * 128)
    b_pad = -(-batch // TILE) * TILE
    kd = jax.random.key_data(key)
    if kd.shape != (2,):  # kernel consumes exactly 2 seed words
        raise ValueError(
            f"sample_states_hw requires a 2-word (threefry) key; got "
            f"key_data shape {kd.shape} — e.g. 'rbg' keys (4 words) would "
            f"silently drop half their state")
    seeds = kd.astype(jnp.uint32).astype(jnp.int32)
    thresh = bernoulli_thresholds(unavail, always_up, n_pad)
    out = pl.pallas_call(
        _kernel,
        grid=(b_pad // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, n_pad), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((TILE, n_pad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), jnp.uint8),
    )(seeds, thresh)
    return out[:batch, :n].astype(bool)


def available() -> bool:
    return jax.default_backend() == "tpu"


def _selfcheck(batch: int = 1 << 20) -> dict:
    """On-hardware sanity: per-component failure-rate z-scores vs U.

    Run manually (scripts/probe_hw_sampler.py); returns the worst
    |z| over components and a tile-decorrelation check.
    """
    from ..core import cases
    from ..core.system import build_system
    from ..utils.config import CompatFlags

    sys_ = build_system(cases.rts24(), CompatFlags())
    key = jax.random.key(7)
    down = np.asarray(sample_states_hw(key, sys_.unavail,
                                       sys_.always_up_nsq, batch))
    u = np.asarray(sys_.unavail)
    u = np.where(np.asarray(sys_.always_up_nsq), 0.0, u)
    rate = down.mean(axis=0)
    sd = np.sqrt(np.maximum(u * (1 - u), 1e-12) / batch)
    z = (rate - u) / np.where(sd > 0, sd, 1.0)
    z = np.where(u > 0, z, rate * batch)   # pinned: any failure is a bug
    half = batch // 2
    return {
        "worst_abs_z": float(np.max(np.abs(z))),
        "pinned_failures": int(down[:, np.asarray(sys_.always_up_nsq)].sum()),
        "halves_differ": bool((down[:half] != down[half:2 * half]).any()),
    }
