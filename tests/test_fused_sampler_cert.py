"""Fused sampler+certificate kernel (ops/fused_sampler_cert.py) and its
downstream completion (dcopf.certify_finish).

The kernel's in-core hardware PRNG only exists on TPU, so these tests
drive the explicit-state mode (``down=``) in Pallas interpret mode on
the CPU mesh — that exercises every certificate instruction in the
kernel (the PRNG branch is three lines shared with ops/hw_sampler,
whose distribution tests cover it) plus the full finish/LP composition.
Hardware parity + throughput live in scripts/probe_fused_tier1.py.

Contract under test (module docstring of fused_sampler_cert):
  1. soundness — every kernel-certified lane is certified by the full
     jnp certificate, and its shed candidate passes an independent f64
     post-outage flow check;
  2. completeness after finish — kernel quick-pass + certify_finish
     reproduces dcopf.certify_states' certified set exactly (the guard
     band may only route lanes to the finish re-check, never lose them);
  3. end-to-end — evaluate_states_screened(pre=...) returns the same
     DNS as the default tier-1 path on the same states.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines import dcopf
from powersystemsreliabilityassessment_tpu.ops import fused_sampler_cert
from powersystemsreliabilityassessment_tpu.utils.config import (
    CompatFlags, IPMConfig)


@pytest.fixture(scope="module")
def sys24():
    return build_system(cases.rts24(), CompatFlags())


def _boosted_states(sys_, key, batch, boost=40.0):
    p = jnp.minimum(sys_.unavail * boost, 0.5)
    down = jax.random.uniform(key, (batch, p.shape[0])) < p[None, :]
    return down & ~sys_.always_up_nsq[None, :]


def _quick(sys_, down):
    key = jax.random.key(0)  # unused in explicit-state mode
    return fused_sampler_cert.sample_certify_quick(
        key, sys_, down.shape[0], down=down)


def test_quick_pass_is_sound(sys24):
    """Kernel-certified lanes are a subset of the full jnp certificate,
    and their candidates pass an independent f64 flow check."""
    B = 1024
    down = _boosted_states(sys24, jax.random.key(7), B)
    load = jnp.broadcast_to(sys24.load_pd[None, :], (B, sys24.n_load))
    d_u8, ok1, deficit, shed = _quick(sys24, down)

    ref = dcopf.certify_states(sys24, down, load, woodbury_k=2)
    ok1_np = np.asarray(ok1)
    assert ok1_np.sum() > 500           # the quick pass does real work
    assert (~ok1_np | np.asarray(ref.certified)).all()   # subset
    # Near-completeness of the quick pass: among eligible (n_out <= 1)
    # lanes, it may only lose jnp-first-pass-certified lanes to its
    # rounding guard band — a sliver, not a systematic gap.
    ref0 = dcopf.certify_states(sys24, down, load, woodbury_k=2,
                                repair_iters=0)
    n_out1 = np.asarray(jnp.sum(down[:, sys24.n_gen:], axis=1)) <= 1
    first_pass = np.asarray(ref0.certified) & n_out1
    missed = first_pass & ~ok1_np
    assert missed.sum() <= 0.02 * first_pass.sum()
    np.testing.assert_allclose(np.asarray(deficit),
                               np.asarray(ref.deficit), atol=1e-4)
    assert (np.asarray(d_u8) == np.asarray(down)).all()

    # f64 feasibility of the kernel's own candidate on certified lanes
    # (n_out <= 1 by the kernel's eligibility gate).
    shed64 = np.asarray(shed, np.float64)
    lp = np.asarray(load, np.float64)
    disp = np.asarray(
        dcopf._dispatch_candidate(
            sys24, sys24.gen_pmax[None, :]
            * (1.0 - down[:, :sys24.n_gen].astype(jnp.float32)),
            load, shed, jnp.sum(load, axis=1) - deficit),
        np.float64)
    loh = np.asarray(sys24.load_onehot, np.float64)
    inj = (disp @ np.asarray(sys24.gen_bus_onehot, np.float64).T
           + shed64 @ loh.T - lp @ loh.T)
    f = inj @ np.asarray(sys24.ptdf, np.float64).T
    brd = np.asarray(down, np.float64)[:, sys24.n_gen:]
    post = (f + (brd * f) @ np.asarray(sys24.lodf, np.float64).T) \
        * (1.0 - brd)
    rate = np.asarray(sys24.br_rate, np.float64)
    ok_f64 = (np.abs(post) <= rate[None, :] + 2e-4).all(axis=1)
    assert (brd.sum(axis=1)[ok1_np] <= 1).all()
    assert ok_f64[ok1_np].all()


def test_finish_reproduces_full_certificate(sys24):
    """quick + certify_finish == certify_states (certified set, deficit,
    and copper-bound shed totals) when the finish buffer holds every
    needy lane."""
    B = 1024
    down = _boosted_states(sys24, jax.random.key(11), B)
    load = jnp.broadcast_to(sys24.load_pd[None, :], (B, sys24.n_load))
    _, ok1, deficit, shed = _quick(sys24, down)
    fin = dcopf.certify_finish(sys24, down, load, deficit, shed, ok1,
                               finish_buffer=B, woodbury_k=2)
    ref = dcopf.certify_states(sys24, down, load, woodbury_k=2)

    ca, cb = np.asarray(ref.certified), np.asarray(fin.certified)
    n_out = np.asarray(jnp.sum(down[:, sys24.n_gen:], axis=1))
    assert (n_out >= 2).sum() > 20      # exercises the Woodbury block
    assert (ca == cb).all()
    np.testing.assert_allclose(np.asarray(fin.deficit),
                               np.asarray(ref.deficit), atol=1e-4)
    c = ca & cb
    np.testing.assert_allclose(
        np.asarray(fin.shed, np.float64)[c].sum(axis=1),
        np.asarray(fin.deficit, np.float64)[c], atol=2e-4)


def test_screened_eval_pre_matches_default(sys24):
    """End to end: evaluate_states_screened with the fused-path
    certificate handed in as ``pre`` gives the same per-state DNS as
    the default internal tier-1 pass."""
    B = 512
    down = _boosted_states(sys24, jax.random.key(3), B)
    load = jnp.broadcast_to(sys24.load_pd[None, :], (B, sys24.n_load))
    d_u8, ok1, deficit, shed = _quick(sys24, down)
    pre = dcopf.certify_finish(sys24, d_u8, load, deficit, shed, ok1,
                               finish_buffer=B, woodbury_k=2)
    compat, ipm = CompatFlags(), IPMConfig()
    res_p, nov_p = dcopf.evaluate_states_screened(
        sys24, d_u8, load, B, compat, ipm, pre=pre, woodbury_k=2)
    res_d, nov_d = dcopf.evaluate_states_screened(
        sys24, down, load, B, compat, ipm, woodbury_k=2)
    assert int(nov_p) == 0 and int(nov_d) == 0
    np.testing.assert_allclose(np.asarray(res_p.dns_mw),
                               np.asarray(res_d.dns_mw), atol=5e-3)
    np.testing.assert_allclose(np.asarray(res_p.nodal_mw),
                               np.asarray(res_d.nodal_mw), atol=5e-3)
    assert (np.asarray(res_p.failure) == np.asarray(res_d.failure)).all()


def test_finish_buffer_overflow_stays_uncertified(sys24):
    """Needy lanes past the finish buffer must stay uncertified (they
    fall to the LP) — never silently certified."""
    B = 512
    down = _boosted_states(sys24, jax.random.key(5), B, boost=60.0)
    load = jnp.broadcast_to(sys24.load_pd[None, :], (B, sys24.n_load))
    _, ok1, deficit, shed = _quick(sys24, down)
    n_need = int(jnp.sum(~ok1))
    assert n_need > 8
    small = 8
    fin = dcopf.certify_finish(sys24, down, load, deficit, shed, ok1,
                               finish_buffer=small, woodbury_k=2)
    full = dcopf.certify_finish(sys24, down, load, deficit, shed, ok1,
                                finish_buffer=B, woodbury_k=2)
    fs, fl = np.asarray(fin.certified), np.asarray(full.certified)
    # small-buffer result is a subset of the full-buffer result, and
    # both only ever ADD to the quick-pass mask
    assert (~fs | fl).all()
    assert (~np.asarray(ok1) | fs).all()
    assert fs.sum() <= fl.sum()


def test_batch_not_tile_multiple(sys24):
    B = fused_sampler_cert.TILE + 17
    down = _boosted_states(sys24, jax.random.key(9), B, boost=25.0)
    load = jnp.broadcast_to(sys24.load_pd[None, :], (B, sys24.n_load))
    d_u8, ok1, deficit, shed = _quick(sys24, down)
    assert d_u8.shape == (B, sys24.n_comp)
    assert ok1.shape == (B,) and deficit.shape == (B,)
    ref = dcopf.certify_states(sys24, down, load, woodbury_k=2)
    np.testing.assert_allclose(np.asarray(deficit),
                               np.asarray(ref.deficit), atol=1e-4)
    assert (~np.asarray(ok1) | np.asarray(ref.certified)).all()


def test_supported_gate():
    sys300 = build_system(cases.case300s(), CompatFlags())
    assert not fused_sampler_cert.supported(sys300)
    sys24 = build_system(cases.rts24(), CompatFlags())
    assert fused_sampler_cert.supported(sys24)


def test_study_step_falls_back_off_tpu(sys24):
    """make_nsq_batch_step(fused_tier1=True) must build and run on the
    CPU mesh (hardware PRNG absent -> jnp fallback), keeping the flag
    safe in CI and on non-TPU backends."""
    from powersystemsreliabilityassessment_tpu.parallel import mesh as meshlib
    from powersystemsreliabilityassessment_tpu.studies import hl2_nsq
    mesh = meshlib.scenario_mesh()
    step = hl2_nsq.make_nsq_batch_step(
        sys24, mesh, 128, CompatFlags(), IPMConfig(), max_lp=64,
        fused_tier1=True)
    m, n_over, n_inf = step(jax.random.key(0))
    assert int(m.n) == 128 * mesh.devices.size
    assert np.isfinite(float(m.sum_dns))
