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


def test_blocked_chol_solve_small(monkeypatch):
    from powersystemsreliabilityassessment_tpu.ops import blocked_chol as bl
    monkeypatch.setattr(bl, "PANEL", 5)  # force multi-panel at tiny m
    rng = np.random.default_rng(2)
    B, m = bc.LANES, 12
    A = rng.normal(size=(B, m, m + 4)).astype(np.float32)
    M = jnp.asarray(A @ np.swapaxes(A, 1, 2)
                    + 8 * np.eye(m, dtype=np.float32))
    r = jnp.asarray(rng.normal(size=(B, m)).astype(np.float32))
    fac = bl.blocked_cholesky(M)
    x = bl.blocked_cho_solve(fac, r)
    xref = jnp.linalg.solve(jnp.asarray(M, jnp.float64) if False else M,
                            r[..., None])[..., 0]
    rel = float(jnp.max(jnp.abs(x - xref)) / jnp.max(jnp.abs(xref)))
    # iterative refinement removes the panel-lift perturbation
    assert rel < 2e-5


def test_blocked_chol_refinement_removes_lift(monkeypatch):
    """Even a large panel lift must not reach the solution."""
    from powersystemsreliabilityassessment_tpu.ops import blocked_chol as bl
    monkeypatch.setattr(bl, "PANEL", 5)
    monkeypatch.setattr(bl, "LIFT", 1e-3)
    monkeypatch.setattr(bl, "REFINE_STEPS", 3)
    rng = np.random.default_rng(7)
    B, m = bc.LANES, 13
    A = rng.normal(size=(B, m, m + 2)).astype(np.float32)
    M = jnp.asarray(A @ np.swapaxes(A, 1, 2)
                    + 4 * np.eye(m, dtype=np.float32))
    r = jnp.asarray(rng.normal(size=(B, m)).astype(np.float32))
    x = bl.blocked_cho_solve(bl.blocked_cholesky(M), r)
    resid = np.asarray(r - jnp.einsum("bmn,bn->bm", M, x))
    rel = np.max(np.abs(resid)) / np.max(np.abs(np.asarray(r)))
    assert rel < 1e-4


def test_blocked_chol_rescue_splice(monkeypatch):
    """Force the fragile-lane rescue (all lanes flagged): the panels
    spliced from the XLA factor must solve as accurately as the normal
    path — this pins the batch-minor/batch-major layout conversions in
    the rescue branch."""
    from powersystemsreliabilityassessment_tpu.ops import blocked_chol as bl
    monkeypatch.setattr(bl, "PANEL", 5)
    monkeypatch.setattr(bl, "PROBE_BAD_REL", -1.0)  # every lane "bad"
    rng = np.random.default_rng(11)
    B, m = bc.LANES, 12
    A = rng.normal(size=(B, m, m + 4)).astype(np.float32)
    M = jnp.asarray(A @ np.swapaxes(A, 1, 2)
                    + 8 * np.eye(m, dtype=np.float32))
    r = jnp.asarray(rng.normal(size=(B, m)).astype(np.float32))
    x = bl.blocked_cho_solve(bl.blocked_cholesky(M), r)
    xref = jnp.linalg.solve(M, r[..., None])[..., 0]
    rel = float(jnp.max(jnp.abs(x - xref)) / jnp.max(jnp.abs(xref)))
    assert rel < 2e-5
