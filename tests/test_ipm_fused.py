"""Fused-kernel structured IPM vs the generic materialized-A solver.

The fused path (ops/ipm_fused.py + engines/lp_ipm_structured.py) is the
TPU production route for RTS-24-class DC-OPF LPs; off-TPU it runs under
``pallas_call(interpret=True)``, which is what these tests exercise. The
generic path (engines/lp_ipm_batched.py) is the reference: identical
algorithm, materialized constraint tensor.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines import (
    dcopf, lp_ipm_batched, lp_ipm_structured)
from powersystemsreliabilityassessment_tpu.models import twostate
from powersystemsreliabilityassessment_tpu.ops.ipm_fused import build_structure
from powersystemsreliabilityassessment_tpu.utils.config import (
    CompatFlags, IPMConfig)

COMPAT = CompatFlags()


@pytest.fixture(scope="module")
def setup():
    case = cases.rts24()
    sys_ = build_system(case, COMPAT)
    st = build_structure(sys_)
    B = 128
    rng = np.random.default_rng(11)
    u = twostate.unavailability(case)
    down = rng.uniform(size=(B, case.n_comp)) < 3 * u[None, :]
    down[:, 14] = False
    # sprinkle single-line outages so flow rows vary across lanes
    down[np.arange(0, B, 3),
         case.n_gen + rng.integers(0, case.n_branch, len(range(0, B, 3)))
         ] = True
    gu = jnp.asarray(1.0 - down[:, :case.n_gen].astype(np.float32))
    bu = jnp.asarray(1.0 - down[:, case.n_gen:].astype(np.float32))
    load = jnp.asarray(np.tile(np.asarray(sys_.load_pd)[None, :], (B, 1)))
    return case, sys_, st, gu, bu, load


def test_vectors_match_materialized_builder(setup):
    case, sys_, st, gu, bu, load = setup
    ipm = IPMConfig()
    c, A, b, l, u = jax.vmap(
        lambda g, br, ld: dcopf.build_state_lp(sys_, g, br, ld, COMPAT,
                                               ipm.theta_max))(gu, bu, load)
    c2, b2, l2, u2, colscale = dcopf.build_state_lp_vectors(
        sys_, gu, bu, load, COMPAT, ipm.theta_max)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(l), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u2))


def test_vectors_match_with_enforce_pmin(setup):
    import dataclasses as dc
    case, sys_, st, gu, bu, load = setup
    ipm = IPMConfig()
    compat_pm = dc.replace(COMPAT, enforce_pmin=True)
    c, A, b, l, u = jax.vmap(
        lambda g, br, ld: dcopf.build_state_lp(sys_, g, br, ld, compat_pm,
                                               ipm.theta_max))(gu, bu, load)
    c2, b2, l2, u2, _ = dcopf.build_state_lp_vectors(
        sys_, gu, bu, load, compat_pm, ipm.theta_max)
    np.testing.assert_array_equal(np.asarray(l), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u2))


def test_structured_products_match_materialized_a(setup):
    case, sys_, st, gu, bu, load = setup
    ipm = IPMConfig()
    c, A, b, l, u = jax.vmap(
        lambda g, br, ld: dcopf.build_state_lp(sys_, g, br, ld, COMPAT,
                                               ipm.theta_max))(gu, bu, load)
    _, _, _, _, colscale = dcopf.build_state_lp_vectors(
        sys_, gu, bu, load, COMPAT, ipm.theta_max)
    rng = np.random.default_rng(5)
    B = gu.shape[0]
    v = jnp.asarray(rng.normal(size=(B, st.n)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, st.m)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bmn,bn->bm", A, v)),
        np.asarray(lp_ipm_structured.mv(st, colscale, bu, v)),
        atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bmn,bm->bn", A, y)),
        np.asarray(lp_ipm_structured.mtv(st, colscale, bu, y)),
        atol=2e-5)
    cw = jnp.asarray(rng.uniform(0.5, 2.0, size=(B, st.n)).astype(np.float32))
    M1 = jnp.einsum("bmn,bn,bkn->bmk", A, cw, A)
    M2 = lp_ipm_structured.normal_matrix(st, colscale * colscale * cw, bu)
    np.testing.assert_allclose(np.asarray(M1), np.asarray(M2), atol=2e-5)


def test_fused_solver_matches_generic(setup):
    case, sys_, st, gu, bu, load = setup
    ipm = IPMConfig(iterations=10)
    c, A, b, l, u = jax.vmap(
        lambda g, br, ld: dcopf.build_state_lp(sys_, g, br, ld, COMPAT,
                                               ipm.theta_max))(gu, bu, load)
    ref = lp_ipm_batched.solve_box_lp_batched(c, A, b, l, u, ipm)
    c2, b2, l2, u2, colscale = dcopf.build_state_lp_vectors(
        sys_, gu, bu, load, COMPAT, ipm.theta_max)
    sol = lp_ipm_structured.solve_box_lp_structured(
        st, colscale, bu, c2, b2, l2, u2, ipm)
    # Objectives (DNS) agree below the 0.1 MW (= 1e-3 p.u.) reference
    # noise floor; the paths differ only in f32 accumulation order
    # (blocked vs per-row substitution).
    np.testing.assert_allclose(np.asarray(sol.objective),
                               np.asarray(ref.objective), atol=1e-3)
    assert float(sol.primal_residual.max()) < 2e-3
    # The solution must be feasible for the materialized constraints too.
    rp = jnp.einsum("bmn,bn->bm", A, sol.x) - b
    assert float(jnp.abs(rp).max()) < 2e-3
    assert bool(jnp.all(sol.x >= l - 1e-5)) and bool(jnp.all(sol.x <= u + 1e-5))


def test_early_exit_keeps_hard_lane_among_easy(setup):
    # Whole-block early exit (ops/ipm_fused.py while_loop) may only fire
    # when EVERY lane is frozen. The hazard case is one slow lane among
    # 127 instantly-converging ones: if the exit keyed on the majority,
    # the hard lane would return its (bad) early iterate and miss the
    # generic solver's objective by far more than the noise floor.
    case, sys_, st, gu, bu, load = setup
    ipm = IPMConfig(early_exit=True)
    B = gu.shape[0]
    gu_e = jnp.ones_like(gu)
    bu_e = jnp.ones_like(bu)
    # Lane 7: deep generation contingency (drop the 8 largest units).
    order = np.argsort(-np.asarray(case.gen_pmax))
    gu_e = gu_e.at[7, order[:8]].set(0.0)
    c, A, b, l, u = jax.vmap(
        lambda g, br, ld: dcopf.build_state_lp(sys_, g, br, ld, COMPAT,
                                               ipm.theta_max))(
        gu_e, bu_e, load)
    ref = lp_ipm_batched.solve_box_lp_batched(c, A, b, l, u, ipm)
    c2, b2, l2, u2, colscale = dcopf.build_state_lp_vectors(
        sys_, gu_e, bu_e, load, COMPAT, ipm.theta_max)
    sol = lp_ipm_structured.solve_box_lp_structured(
        st, colscale, bu_e, c2, b2, l2, u2, ipm)
    np.testing.assert_allclose(np.asarray(sol.objective),
                               np.asarray(ref.objective), atol=1e-3)
    # The hard lane actually sheds (the contingency is real).
    assert float(sol.objective[7]) > 1.0
