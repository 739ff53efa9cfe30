"""Parity: fused Pallas certificate kernel vs the jnp certify_states.

ops/certify_kernel.py is a measured-slower experiment (see its
docstring), NOT the production path — these tests keep it honest anyway
(Pallas interpret mode on CPU) against the jnp reference path on
outage-rich batches covering n_out = 0/1/2/3+ and islanding lanes, so
the negative result stays reproducible and the kernel stays correct if
future hardware changes the MXU-padding trade.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines import dcopf
from powersystemsreliabilityassessment_tpu.ops import certify_kernel
from powersystemsreliabilityassessment_tpu.utils.config import CompatFlags


@pytest.fixture(scope="module")
def sys24():
    return build_system(cases.rts24(), CompatFlags())


def _boosted_states(sys_, key, batch, boost=40.0):
    p = jnp.minimum(sys_.unavail * boost, 0.5)
    down = jax.random.uniform(key, (batch, p.shape[0])) < p[None, :]
    return down & ~sys_.always_up_nsq[None, :]


def test_fused_matches_jnp_on_boosted_batch(sys24):
    down = _boosted_states(sys24, jax.random.key(7), 1024)
    load = jnp.broadcast_to(sys24.load_pd[None, :], (1024, sys24.n_load))
    # The fused kernel implements the rank-2 (pair) Woodbury only; pin
    # the jnp reference to woodbury_k=2 (the default today, but the pin
    # keeps the match exact if the default ever changes).
    ref = dcopf.certify_states(sys24, down, load, woodbury_k=2)
    new = certify_kernel.certify_states_fused(sys24, down, load)

    ca, cb = np.asarray(ref.certified), np.asarray(new.certified)
    n_out = np.asarray(jnp.sum(down[:, sys24.n_gen:], axis=1))
    assert (n_out >= 2).sum() > 20          # the batch exercises N-2 lanes
    assert (ca == cb).all()
    np.testing.assert_allclose(np.asarray(new.deficit),
                               np.asarray(ref.deficit), atol=1e-5)
    both = ca & cb
    np.testing.assert_allclose(np.asarray(new.shed)[both],
                               np.asarray(ref.shed)[both], atol=1e-5)
    np.testing.assert_allclose(np.asarray(new.dispatch)[both],
                               np.asarray(ref.dispatch)[both], atol=1e-5)


def test_fused_certificates_are_feasible(sys24):
    """Certified candidates must pass an independent f64 post-outage
    flow check (the certificate's own contract, not just jnp parity)."""
    down = _boosted_states(sys24, jax.random.key(11), 512)
    load = jnp.broadcast_to(sys24.load_pd[None, :], (512, sys24.n_load))
    cert = certify_kernel.certify_states_fused(sys24, down, load)

    c = np.asarray(cert.certified)
    shed = np.asarray(cert.shed, np.float64)
    disp = np.asarray(cert.dispatch, np.float64)
    lp = np.asarray(load, np.float64)
    gboh = np.asarray(sys24.gen_bus_onehot, np.float64)
    loh = np.asarray(sys24.load_onehot, np.float64)
    ptdf = np.asarray(sys24.ptdf, np.float64)
    lodf = np.asarray(sys24.lodf, np.float64)
    rate = np.asarray(sys24.br_rate, np.float64)
    brd = np.asarray(down, np.float64)[:, sys24.n_gen:]
    n_out = brd.sum(axis=1)

    inj = disp @ gboh.T + shed @ loh.T - lp @ loh.T
    f = inj @ ptdf.T
    post = (f + (brd * f) @ lodf.T) * (1.0 - brd)
    ok1 = (np.abs(post) <= rate[None, :] + 2e-4).all(axis=1)
    # single/intact lanes: the LODF-corrected check is exact
    sel = c & (n_out <= 1)
    assert sel.sum() > 100
    assert ok1[sel].all()
    # certificate total equals the copper bound on certified lanes
    np.testing.assert_allclose(shed[c].sum(axis=1),
                               np.asarray(cert.deficit, np.float64)[c],
                               atol=1e-4)


def test_fused_padding_path(sys24):
    """B not a multiple of the kernel tile exercises the pad/slice path."""
    B = certify_kernel.TILE + 17
    down = _boosted_states(sys24, jax.random.key(3), B, boost=25.0)
    load = jnp.broadcast_to(sys24.load_pd[None, :], (B, sys24.n_load))
    ref = dcopf.certify_states(sys24, down, load, woodbury_k=2)
    new = certify_kernel.certify_states_fused(sys24, down, load)
    assert np.asarray(new.certified).shape == (B,)
    assert (np.asarray(ref.certified) == np.asarray(new.certified)).all()
    np.testing.assert_allclose(np.asarray(new.deficit),
                               np.asarray(ref.deficit), atol=1e-5)


def test_fused_multiarea_case(sys24):
    """A second topology (RTS-96 replicate) guards against RTS-24-only
    shape assumptions in the kernel."""
    sys96 = build_system(cases.rts96(), CompatFlags())
    down = _boosted_states(sys96, jax.random.key(5), 256, boost=10.0)
    load = jnp.broadcast_to(sys96.load_pd[None, :], (256, sys96.n_load))
    ref = dcopf.certify_states(sys96, down, load, woodbury_k=2)
    new = certify_kernel.certify_states_fused(sys96, down, load)
    assert (np.asarray(ref.certified) == np.asarray(new.certified)).all()
    # RTS-96 capacity sums reach ~90 p.u.; sum-reduction vs dot-product
    # reassociation leaves ~1e-5 relative f32 noise in the deficit.
    np.testing.assert_allclose(np.asarray(new.deficit),
                               np.asarray(ref.deficit),
                               rtol=1e-4, atol=1e-4)
