"""Pallas batch-minor kernels (interpret mode on CPU; small sizes —
interpret mode executes op-by-op). Full-size validation runs on TPU in
scripts/parity_run.py / bench.py."""
import jax
import jax.numpy as jnp
import numpy as np

from powersystemsreliabilityassessment_tpu.ops import batched_chol as bc


def test_layout_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(256, 5, 7)).astype(np.float32))
    y = bc.from_batch_minor(bc.to_batch_minor(x))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_chol_solve_small():
    rng = np.random.default_rng(1)
    B, m = bc.LANES, 6
    A = rng.normal(size=(B, m, m + 3)).astype(np.float32)
    M = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 5 * np.eye(m, dtype=np.float32))
    r = jnp.asarray(rng.normal(size=(B, m)).astype(np.float32))

    Lt = bc.cholesky_bm(bc.to_batch_minor(M))
    y = bc.from_batch_minor(bc.cho_solve_bm(Lt, bc.to_batch_minor(r)))

    L = bc.from_batch_minor(Lt)
    Lref = np.linalg.cholesky(np.asarray(M, np.float64))
    yref = jax.vmap(lambda LL, rr: jax.scipy.linalg.cho_solve(
        (LL, True), rr))(jnp.linalg.cholesky(M), r)
    assert np.max(np.abs(np.tril(np.asarray(L)) - Lref)) < 1e-3
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref), atol=1e-3)
