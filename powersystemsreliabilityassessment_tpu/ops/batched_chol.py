"""Pallas TPU kernels: batch-minor Cholesky factorization and triangular
solves for many tiny SPD systems.

XLA's batched ``cholesky`` on TPU serializes each small factorization on
the vector unit (measured ~7 ms for [1024, 62, 62] f32 on v5e — the
dominant cost of the whole interior-point iteration). These kernels use the
classic *batch-minor* layout instead: the batch axis is mapped onto the 128
VPU lanes, so the k-loop of the factorization runs once while 128 problem
instances advance in lock-step as [m, 128] vector operations.

Implementation notes (Mosaic constraints):
* dynamic indexing happens on REFS via ``pl.ds`` (value-level
  ``dynamic_slice`` is not lowered);
* the rank-1 trailing update uses the symmetry of the active submatrix to
  read the pivot row and pivot column separately instead of transposing;
* scratch lives in VMEM via ``pl.run_scoped``.

Layout: matrices are passed as [nblk, m, m, 128] ("batch-minor blocks",
from :func:`to_batch_minor`), vectors as [nblk, m, 128].

All kernels also run under ``pallas_call(interpret=True)`` off-TPU for
testing (tests/test_ops.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# Per-lane pivot floor: matrices reaching these kernels are equilibrated
# (unit diagonal), so a pivot this small means the lane's factorization
# has lost positive definiteness to f32 cancellation. Flooring the pivot
# bounds the factor's entries (|L| <~ 1/sqrt(floor)) instead of the
# 1e-30 clamp's ~1e15 garbage rows — equivalent to lifting exactly the
# offending diagonal entries of exactly the offending lanes, which the
# iterative refinement in ops/blocked_chol.py then removes from the
# solution (its keep-best guard needs a bounded factor to converge).
PIVOT_FLOOR = 1e-6


def to_batch_minor(x: jax.Array) -> jax.Array:
    """[B, ...] -> [B // LANES, ..., LANES]. B must be a multiple of 128."""
    b = x.shape[0]
    assert b % LANES == 0, f"batch {b} not a multiple of {LANES}"
    rest = x.shape[1:]
    xt = x.reshape(b // LANES, LANES, *rest)
    perm = (0, *range(2, 2 + len(rest)), 1)
    return jnp.transpose(xt, perm)


def from_batch_minor(x: jax.Array) -> jax.Array:
    """Inverse of :func:`to_batch_minor`."""
    nblk = x.shape[0]
    rest = x.shape[1:-1]
    perm = (0, x.ndim - 1, *range(1, x.ndim - 1))
    xt = jnp.transpose(x, perm)
    return xt.reshape(nblk * LANES, *rest)


def _chol_kernel(m_ref, out_ref):
    """Cholesky of a [1, m, m, 128] tile; lanes = independent systems."""
    mdim = m_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (mdim, 1, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, mdim, 1), 1)

    def body(a):
        a[...] = m_ref[0]

        def step(k, _):
            akk = a[pl.ds(k, 1), pl.ds(k, 1), :]          # [1,1,128]
            inv = jax.lax.rsqrt(jnp.maximum(akk, PIVOT_FLOOR))
            ck = a[:, pl.ds(k, 1), :] * inv               # [m,1,128]
            ck = jnp.where(row >= k, ck, 0.0)
            # Pivot ROW (for j > k) equals pivot column by symmetry of the
            # active trailing submatrix — avoids a transpose.
            rk = a[pl.ds(k, 1), :, :] * inv               # [1,m,128]
            rk = jnp.where(col > k, rk, 0.0)
            strict = jnp.where(row > k, ck, 0.0)
            # Trailing update predicated per 8-row strip: rows <= k are
            # exact zeros under the masks, so skipping their strips is a
            # pure VMEM-traffic optimization (~2x — the factorization is
            # bandwidth-bound; measured faster than multi-column panel
            # variants, see ops/ipm_fused.py).
            for rb in range((mdim + 7) // 8):
                r0 = rb * 8
                r1 = min(r0 + 8, mdim)

                def upd(r0=r0, r1=r1):
                    a[r0:r1, :, :] = (a[r0:r1, :, :]
                                      - strict[r0:r1] * rk)

                pl.when(k < r1)(upd)
            a[:, pl.ds(k, 1), :] = ck                     # write L column k
            return 0

        jax.lax.fori_loop(0, mdim, step, 0)
        out_ref[0] = a[...]

    pl.run_scoped(body, pltpu.VMEM((mdim, mdim, LANES), m_ref.dtype))


def _solve_kernel(l_ref, r_ref, out_ref):
    """Solve L L' x = r per lane. l: [1, m, m, 128], r: [1, m, 128]."""
    mdim = l_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (mdim, 1), 0)

    def body(y):
        y[...] = r_ref[0]

        def fwd(i, _):
            li = l_ref[0, pl.ds(i, 1), :, :][0]            # [m,128] row i
            s = jnp.sum(jnp.where(row < i, li * y[...], 0.0), axis=0,
                        keepdims=True)                     # [1,128]
            lii = l_ref[0, pl.ds(i, 1), pl.ds(i, 1), :][0]  # [1,128]
            y[pl.ds(i, 1), :] = (y[pl.ds(i, 1), :] - s) / lii
            return 0

        jax.lax.fori_loop(0, mdim, fwd, 0)

        def bwd(t, _):
            i = mdim - 1 - t
            lc = l_ref[0, :, pl.ds(i, 1), :][:, 0]         # [m,128] col i
            s = jnp.sum(jnp.where(row > i, lc * y[...], 0.0), axis=0,
                        keepdims=True)
            lii = l_ref[0, pl.ds(i, 1), pl.ds(i, 1), :][0]
            y[pl.ds(i, 1), :] = (y[pl.ds(i, 1), :] - s) / lii
            return 0

        jax.lax.fori_loop(0, mdim, bwd, 0)
        out_ref[0] = y[...]

    pl.run_scoped(body, pltpu.VMEM((mdim, LANES), r_ref.dtype))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.jit
def cholesky_bm(m_bm: jax.Array) -> jax.Array:
    """Batched Cholesky in batch-minor layout [nblk, m, m, 128]."""
    nblk, mdim = m_bm.shape[0], m_bm.shape[1]
    return pl.pallas_call(
        _chol_kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((1, mdim, mdim, LANES),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, mdim, mdim, LANES),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(m_bm.shape, m_bm.dtype),
        interpret=_interpret(),
    )(m_bm)


@jax.jit
def cho_solve_bm(l_bm: jax.Array, r_bm: jax.Array) -> jax.Array:
    """Solve L L' x = r in batch-minor layout. r: [nblk, m, 128]."""
    nblk, mdim = l_bm.shape[0], l_bm.shape[1]
    return pl.pallas_call(
        _solve_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, mdim, mdim, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mdim, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mdim, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(r_bm.shape, r_bm.dtype),
        interpret=_interpret(),
    )(l_bm, r_bm)
