"""Sampling engines: statistical properties + reference semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.models import twostate
from powersystemsreliabilityassessment_tpu.sampling import (
    chronological, markov, state)


class TestBernoulli:
    def test_mean_matches_unavailability(self):
        u = jnp.asarray(twostate.unavailability(cases.rts24()), jnp.float32)
        always = jnp.zeros(71, bool)
        down = state.sample_states(jax.random.key(0), u, always, 20000)
        freq = np.asarray(down.mean(axis=0))
        np.testing.assert_allclose(freq, np.asarray(u), atol=0.012)

    def test_always_up_mask(self):
        u = jnp.full((71,), 0.5, jnp.float32)
        always = jnp.zeros(71, bool).at[14].set(True)
        down = state.sample_states(jax.random.key(1), u, always, 500)
        assert not bool(down[:, 14].any())  # mc_sampling.m:40-41 semantics

    def test_hw_impl_falls_back_to_threefry_off_tpu(self):
        # rng_impl="hw" must be a pure throughput substitution: off-TPU
        # (this CPU mesh) it routes to the threefry path bit-identically.
        u = jnp.asarray(twostate.unavailability(cases.rts24()), jnp.float32)
        always = jnp.zeros(71, bool).at[10].set(True)
        a = state.sample_states(jax.random.key(3), u, always, 256)
        b = state.sample_states(jax.random.key(3), u, always, 256,
                                rng_impl="hw")
        assert (np.asarray(a) == np.asarray(b)).all()

    def test_hw_thresholds_exact(self):
        from powersystemsreliabilityassessment_tpu.ops import hw_sampler
        u = jnp.asarray([0.0, 0.02, 0.5, 1.0, 1e-9], jnp.float32)
        always = jnp.asarray([False, False, False, False, True])
        t = np.asarray(hw_sampler.bernoulli_thresholds(u, always, 128))
        assert t.shape == (1, 128)
        # P(draw < t) = t / 2^24 = ceil(U * 2^24) / 2^24: within one
        # 2^-24 quantum of U, and ceil keeps P > 0 whenever U > 0
        # (U = 1e-9 would round to never-fail; it must get threshold 1).
        np.testing.assert_array_equal(
            t[0, :4], [0, int(np.ceil(np.float32(0.02) * 2**24)),
                       2**23, 2**24])
        assert t[0, 4] == 0          # pinned beats U > 0
        assert np.asarray(hw_sampler.bernoulli_thresholds(
            jnp.asarray([1e-9], jnp.float32), jnp.asarray([False]),
            128))[0, 0] == 1
        assert (t[0, 5:] == 0).all()  # padding can never fail

    def test_antithetic_pairs(self):
        u = jnp.full((4,), 0.5, jnp.float32)
        always = jnp.zeros(4, bool)
        down = state.sample_states(jax.random.key(2), u, always, 1000,
                                   antithetic=True)
        a, b = np.asarray(down[:500]), np.asarray(down[500:])
        # at U=0.5 the antithetic pair is the exact complement
        assert (a == ~b).all()


class TestParityCount:
    def test_matches_searchsorted_semantics(self):
        # The fused compare-and-count occupancy must equal the original
        # searchsorted(side="right") parity for the same boundaries.
        u = jnp.asarray(twostate.unavailability(cases.rts24()), jnp.float32)
        sys_mttf = jnp.asarray([450.0, 50.0, 1960.0], jnp.float32)
        sys_mttr = jnp.asarray([50.0, 10.0, 40.0], jnp.float32)
        hours, k = 500, 16
        down = chronological.sample_timeline(jax.random.key(8), sys_mttf,
                                             sys_mttr, hours, k)
        # reference implementation
        key = jax.random.key(8)
        ku, kd = jax.random.split(key)
        uu = jax.random.uniform(ku, (3, k), minval=1e-12, maxval=1.0)
        ud = jax.random.uniform(kd, (3, k), minval=1e-12, maxval=1.0)
        ttf = jnp.round(-sys_mttf[:, None] * jnp.log(uu))
        ttr = jnp.ceil(-sys_mttr[:, None] * jnp.log(ud))
        bounds = jnp.cumsum(
            jnp.stack([ttf, ttr], axis=2).reshape(3, 2 * k), axis=1)
        hour_idx = jnp.arange(hours, dtype=bounds.dtype)
        ref = (jax.vmap(lambda bo: jnp.searchsorted(
            bo, hour_idx, side="right"))(bounds) % 2) == 1
        np.testing.assert_array_equal(np.asarray(down), np.asarray(ref))


class TestImportance:
    def test_weights_equal_exact_likelihood_ratio(self):
        u = jnp.asarray(twostate.unavailability(cases.rts24()), jnp.float32)
        always = jnp.zeros(71, bool).at[14].set(True)
        boost = 3.0
        down, w = state.sample_states_importance(jax.random.key(4), u,
                                                 always, 256, boost)
        down = np.asarray(down)
        w = np.asarray(w, np.float64)
        un = np.asarray(u, np.float64)
        q = np.minimum(boost * un, 0.5)
        free = ~np.asarray(always)
        for i in range(0, 256, 37):
            x = down[i]
            ratio = np.prod(np.where(
                free, np.where(x, un / q, (1 - un) / (1 - q)), 1.0))
            assert w[i] == pytest.approx(ratio, rel=1e-4)
        assert not down[:, 14].any()   # pinned stays pinned

    def test_unbiased_component_moments(self):
        # E_q[w] = 1 and E_q[w * x_i] = U_i (the per-component failure
        # probability under the TARGET measure) — the core IS identity.
        u = jnp.asarray(twostate.unavailability(cases.rts24()), jnp.float32)
        always = jnp.zeros(71, bool).at[14].set(True)
        down, w = state.sample_states_importance(jax.random.key(5), u,
                                                 always, 60000, 3.0)
        w = np.asarray(w, np.float64)
        x = np.asarray(down, np.float64)
        assert np.mean(w) == pytest.approx(1.0, abs=0.01)
        est = (w[:, None] * x).mean(axis=0)
        target = np.where(np.asarray(always), 0.0, np.asarray(u, np.float64))
        np.testing.assert_allclose(est, target, atol=0.004)

    def test_boost_mask_gens_only(self):
        # With boost_mask = gens only: branch columns are sampled from the
        # TRUE measure (q = U, likelihood factor 1), so the exact weight is
        # the product over generator components alone.
        case = cases.rts24()
        u = jnp.asarray(twostate.unavailability(case), jnp.float32)
        always = jnp.zeros(71, bool).at[14].set(True)
        mask = jnp.asarray(np.arange(71) < case.n_gen)
        boost = 5.0
        down, w = state.sample_states_importance(
            jax.random.key(11), u, always, 4096, boost, boost_mask=mask)
        down = np.asarray(down)
        w = np.asarray(w, np.float64)
        un = np.asarray(u, np.float64)
        q = np.where(np.asarray(mask), np.minimum(boost * un, 0.5), un)
        free = ~np.asarray(always)
        for i in range(0, 4096, 511):
            x = down[i]
            ratio = np.prod(np.where(
                free, np.where(x, un / q, (1 - un) / (1 - q)), 1.0))
            assert w[i] == pytest.approx(ratio, rel=1e-4)
        # Branch failure rate stays at the plain-measure level, NOT
        # boosted: mean branch outage count = sum(U_branches) exactly in
        # expectation (and far below the 5x-boosted level).
        n_br_out = down[:, case.n_gen:].sum(axis=1)
        lam_br = float(un[case.n_gen:].sum())
        assert n_br_out.mean() == pytest.approx(lam_br, rel=0.35)
        assert n_br_out.mean() < 2.0 * lam_br  # nowhere near boosted (5x)
        # Gen outages ARE boosted: ~5x the plain rate.
        n_gen_out = down[:, :case.n_gen].sum(axis=1)
        assert n_gen_out.mean() > 2.0

    def test_boost_mask_all_false_is_plain_mc(self):
        u = jnp.asarray([0.01, 0.2, 0.4], jnp.float32)
        always = jnp.zeros(3, bool)
        down, w = state.sample_states_importance(
            jax.random.key(3), u, always, 512, 40.0,
            boost_mask=jnp.zeros(3, bool))
        np.testing.assert_allclose(np.asarray(w), 1.0, rtol=1e-6)
        # marginals match the true measure
        est = np.asarray(down, np.float64).mean(axis=0)
        np.testing.assert_allclose(est, np.asarray(u), atol=0.06)

    def test_q_override_weights_exact(self):
        # Vector proposal (CE path): weights are the exact per-component
        # likelihood ratio for the CLAMPED q.
        u = jnp.asarray(twostate.unavailability(cases.rts24()), jnp.float32)
        always = jnp.zeros(71, bool).at[14].set(True)
        rng = np.random.default_rng(2)
        qv = np.clip(np.asarray(u) * rng.uniform(0.5, 30.0, 71), 0, 0.5)
        down, w = state.sample_states_importance(
            jax.random.key(8), u, always, 512, 0.0,
            q_override=jnp.asarray(qv, jnp.float32))
        down = np.asarray(down)
        w = np.asarray(w, np.float64)
        un = np.asarray(u, np.float64)
        q = np.clip(qv, un, 0.5)      # the sampler's clamp
        free = ~np.asarray(always)
        for i in range(0, 512, 41):
            x = down[i]
            ratio = np.prod(np.where(
                free, np.where(x, un / q, (1 - un) / (1 - q)), 1.0))
            assert w[i] == pytest.approx(ratio, rel=1e-4)
        assert not down[:, 14].any()

    def test_ce_calibration_and_unbiasedness(self):
        # CE pilot on RTS-24 (capacity-driven): learns a valid proposal
        # (q in [U, 0.5], pinned stays 0, gens tilted since deficits are
        # capacity-driven) and the CE study agrees with plain MC.
        from powersystemsreliabilityassessment_tpu.core.system import (
            build_system)
        from powersystemsreliabilityassessment_tpu.studies import hl2_nsq
        from powersystemsreliabilityassessment_tpu.utils.config import (
            CompatFlags, IPMConfig, MCSConfig)
        case = cases.rts24()
        sysm = build_system(case, CompatFlags())
        q, diag = hl2_nsq.calibrate_ce_proposal(
            sysm, CompatFlags(), IPMConfig(), batch=2048, rounds=2,
            boost0=3.0, log_every=0)
        assert q is not None
        un = np.asarray(sysm.unavail, np.float64)
        always = np.asarray(sysm.always_up_nsq)
        assert np.all(q[~always] >= un[~always] - 1e-6)
        assert np.all(q <= 0.5 + 1e-6)
        assert np.all(q[always] == 0.0)
        # capacity-driven system: the learned gen tilt dominates
        assert float(q[:case.n_gen].sum() - un[:case.n_gen].sum()) > \
            float(q[case.n_gen:].sum() - un[case.n_gen:].sum())
        # variance diagnostic improves (or at least does not blow up)
        assert diag["rounds"][-1]["events"] >= 8

        from powersystemsreliabilityassessment_tpu.studies.hl2_nsq import (
            run_nsq_study)
        plain = run_nsq_study(case,
                              MCSConfig(batch_size=1024, max_samples=4096,
                                        seed=9), log_every=0)
        cer = run_nsq_study(case,
                            MCSConfig(batch_size=1024, max_samples=4096,
                                      seed=9, is_ce=True, ce_batch=2048,
                                      ce_rounds=2, ce_boost0=3.0),
                            log_every=0)
        assert cer.edns_mw == pytest.approx(plain.edns_mw, rel=0.35)
        assert np.isfinite(cer.beta)

    def test_nsq_study_importance_agrees_with_plain(self):
        from powersystemsreliabilityassessment_tpu.studies.hl2_nsq import (
            run_nsq_study)
        from powersystemsreliabilityassessment_tpu.utils.config import (
            MCSConfig)
        plain = run_nsq_study(cases.rts24(),
                              MCSConfig(batch_size=1024, max_samples=4096,
                                        seed=9), log_every=0)
        isr = run_nsq_study(cases.rts24(),
                            MCSConfig(batch_size=1024, max_samples=4096,
                                      seed=9, is_boost=2.5), log_every=0)
        # Both estimate the same EDNS (~14.9 at peak); at these tiny
        # sample counts agreement within combined MC noise is the test.
        assert isr.edns_mw == pytest.approx(plain.edns_mw, rel=0.35)
        assert isr.beta < 0.2 and np.isfinite(isr.beta)
        # importance run sees ~boost x more failure states per sample
        assert isr.overflow_states == 0


class TestChronological:
    def test_steady_state_fraction(self):
        mttf = jnp.asarray([450.0, 1100.0])
        mttr = jnp.asarray([50.0, 150.0])
        k = chronological.default_num_draws(np.array([450, 1100.0]),
                                            np.array([50, 150.0]), 8736)
        down = chronological.sample_timeline_batch(
            jax.random.key(3), mttf, mttr, 8736, k, 60)
        frac = np.asarray(down.mean(axis=(0, 2)))
        expect = np.array([50 / 500, 150 / 1250])
        np.testing.assert_allclose(frac, expect, atol=0.02)

    def test_interval_semantics(self):
        # With forced durations the boundary parity must match the
        # reference's integer interval logic (seq_mcsampling.m:366-387):
        # up=3 then down=2 -> hours 0,1,2 UP; 3,4 DOWN; then up again.
        # Emulate via mttf/mttr chosen so the first draws are deterministic
        # in expectation? Instead test the parity kernel directly.
        bounds = jnp.asarray([[3.0, 5.0, 10.0, 12.0]])
        hour = jnp.arange(14, dtype=jnp.float32)
        interval = jax.vmap(lambda bo: jnp.searchsorted(
            bo, hour, side="right"))(bounds)
        downv = (interval % 2) == 1
        expect = [0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 1, 1, 0, 0]
        assert np.asarray(downv[0]).astype(int).tolist() == expect

    def test_draw_count_covers_horizon(self):
        mt = twostate.mean_times(cases.rts24())
        k = chronological.default_num_draws(mt[:, 0], mt[:, 1], 8736)
        # fastest-cycling component: 450+50 h -> ~17.5 cycles/yr
        assert k > 17.5 + 8 * np.sqrt(17.5)
        down = chronological.sample_timeline(
            jax.random.key(4), jnp.asarray(mt[:, 0], jnp.float32),
            jnp.asarray(mt[:, 1], jnp.float32), 8736, k)
        assert down.shape == (71, 8736)


class TestMarkov:
    def test_stationary_distribution(self):
        p01, p10 = twostate.transition_probs(np.array([1000.0]),
                                             np.array([50.0]))
        path = markov.sample_markov_chain_batch(
            jax.random.key(5), jnp.asarray(p01, jnp.float32),
            jnp.asarray(p10, jnp.float32), 2000, 100)
        # discard burn-in, compare to U = 50/1050
        frac = float(path[:, :, 500:].mean())
        assert frac == pytest.approx(50 / 1050, abs=0.01)


class TestDwellTimeDistributions:
    def test_down_run_lengths_match_ceil_exponential(self):
        # The reference's repair durations are ceil(Exp(MTTR))
        # (seq_mcsampling.m:376): P(L = k) = exp(-(k-1)/m) - exp(-k/m).
        import numpy as np

        mttr, mttf = 40.0, 400.0
        k = chronological.default_num_draws(np.array([mttf]),
                                            np.array([mttr]), 8736)
        down = np.asarray(chronological.sample_timeline_batch(
            jax.random.key(7), jnp.asarray([mttf]), jnp.asarray([mttr]),
            8736, k, 400))[:, 0, :]
        # extract run lengths of consecutive True (interior runs only)
        lengths = []
        for row in down:
            d = np.diff(row.astype(int))
            starts = np.where(d == 1)[0] + 1
            ends = np.where(d == -1)[0] + 1
            m = min(len(starts), len(ends))
            s, e = starts[:m], ends[:m]
            e = e[e > s[0]] if m else e
            lengths.extend((e[:len(s)] - s[:len(e)]).tolist())
        lengths = np.asarray([x for x in lengths if x > 0])
        assert len(lengths) > 2000
        mean_expected = 1.0 / (1.0 - np.exp(-1.0 / mttr))  # E[ceil(Exp)]
        assert np.mean(lengths) == pytest.approx(mean_expected, rel=0.05)
        # P(L=1) check
        p1 = 1.0 - np.exp(-1.0 / mttr)
        assert np.mean(lengths == 1) == pytest.approx(p1, abs=0.01)


def test_sparsify_ce_proposal_bounded_tilt():
    # The sparse capped tilt (hl2_nsq.sparsify_ce_proposal): keeps only
    # the top-k BRANCH components by q_hat/U ratio, caps them, floors
    # everything else at U (never a down-tilt), zeroes pinned
    # components — the bounded-likelihood-weight construction motivated
    # by the dense-CE failure on case300s (results/ce_ab.json).
    from powersystemsreliabilityassessment_tpu.core import cases
    from powersystemsreliabilityassessment_tpu.core.system import build_system
    from powersystemsreliabilityassessment_tpu.studies import hl2_nsq
    from powersystemsreliabilityassessment_tpu.utils.config import CompatFlags

    case = cases.rts24()
    sysm = build_system(case, CompatFlags())
    U = np.asarray(sysm.unavail, np.float64)
    always = np.asarray(sysm.always_up_nsq)
    ng = case.n_gen

    rng = np.random.default_rng(0)
    q_hat = U * (1.0 + rng.uniform(0.0, 0.5, U.shape))  # mild tilts
    q_hat[always] = 0.0
    # make three branches stand out by ratio
    stars = ng + np.array([5, 11, 23])
    q_hat[stars] = 0.3

    q = hl2_nsq.sparsify_ce_proposal(q_hat, sysm, top_k=3, q_cap=0.05)
    assert q.dtype == np.float32
    # the three stars are tilted, capped at 0.05
    assert np.allclose(q[stars], 0.05)
    # everything else sits exactly at U (gens included: branches_only)
    rest = np.ones(len(U), bool)
    rest[stars] = False
    assert np.allclose(q[rest & ~always], U[rest & ~always], atol=1e-7)
    assert np.all(q[always] == 0.0)
    # bounded-weight certificate: max possible likelihood weight is
    # prod (1-U)/(1-q) over tilted comps <= ~1 + k*cap
    wmax = np.prod((1 - U[stars]) / (1 - q[stars].astype(np.float64)))
    assert wmax < 1.2


def test_default_max_lp_pf_tier_cap():
    # With the island-PF tier active (large-m systems) the
    # "proportional" plain-MC buffer caps at one 128-lane tile —
    # measured 2.2x step win with identical estimates at case300s
    # (results/r5_maxlp_pf.json). Other modes are unaffected.
    from powersystemsreliabilityassessment_tpu.studies.hl2_nsq import (
        default_max_lp)
    assert default_max_lp(16384, "proportional", pf_tier=True) == 128
    assert default_max_lp(16384, "proportional", pf_tier=False) == 256
    assert default_max_lp(4096, "proportional", pf_tier=True) == 64
    # boosted / lp-mode regimes keep larger buffers off the pf tier,
    # but the large-m HBM envelope caps everything at 2048 (a 4096-lane
    # m~800 IPM buffer OOM'd the 15.75 GB chip at compile)
    assert default_max_lp(16384, "lp", pf_tier=False) == 4096
    assert default_max_lp(16384, "lp", pf_tier=True) == 2048
    assert default_max_lp(16384, "proportional", is_boost=2.0,
                          pf_tier=False) == 8192
    assert default_max_lp(16384, "proportional", is_boost=2.0,
                          pf_tier=True) == 2048


class TestMixtureIS:
    def test_weights_equal_exact_mixture_ratio(self):
        # w must equal p(x) / (a0 p(x) + sum_k ag q_k(x)) exactly,
        # brute-forced per lane in f64.
        u = jnp.asarray(twostate.unavailability(cases.rts24()), jnp.float32)
        always = np.zeros(71, bool); always[14] = True
        groups = np.zeros((3, 71), bool)
        groups[0, :10] = True; groups[1, 10:22] = True
        groups[2, 22:32] = True
        boost, a0 = 2.5, 0.5
        down, w = state.sample_states_mixture(
            jax.random.key(6), u, jnp.asarray(always), 512,
            jnp.asarray(groups), boost, a0)
        down = np.asarray(down); w = np.asarray(w, np.float64)
        un = np.asarray(u, np.float64); un[always] = 0.0
        qb = np.maximum(np.minimum(boost * un, 0.5), un); qb[always] = 0.0

        def loglik(x, q):
            with np.errstate(divide="ignore"):
                lq = np.where(x, np.log(np.maximum(q, 1e-300)),
                              np.log(np.maximum(1 - q, 1e-300)))
            return lq[~always].sum()

        ag = (1 - a0) / 3
        for i in range(0, 512, 41):
            x = down[i]
            lp = loglik(x, un)
            dens = a0 * np.exp(lp)
            for k in range(3):
                qk = np.where(groups[k], qb, un)
                dens += ag * np.exp(loglik(x, qk))
            assert w[i] == pytest.approx(np.exp(lp) / dens, rel=2e-4)
        assert not down[:, 14].any()
        # defensive bound: no weight can exceed 1/alpha0
        assert w.max() <= 1.0 / a0 + 1e-6

    def test_unbiased_component_moments(self):
        # E_q[w] = 1 and E_q[w x_i] = U_i under the mixture proposal.
        u = jnp.asarray(twostate.unavailability(cases.rts24()), jnp.float32)
        always = np.zeros(71, bool); always[14] = True
        groups = np.zeros((4, 71), bool)
        for k in range(4):
            groups[k, 8 * k:8 * (k + 1)] = True
        down, w = state.sample_states_mixture(
            jax.random.key(9), u, jnp.asarray(always), 60000,
            jnp.asarray(groups), 3.0, 0.5)
        w = np.asarray(w, np.float64)
        x = np.asarray(down, np.float64)
        assert np.mean(w) == pytest.approx(1.0, abs=0.01)
        est = (w[:, None] * x).mean(axis=0)
        target = np.where(always, 0.0, np.asarray(u, np.float64))
        np.testing.assert_allclose(est, target, atol=0.005)

    def test_group_events_oversampled(self):
        # The point of the mixture: in-group outage clusters appear far
        # more often than under the plain measure, with weights < 1.
        u = jnp.full((40,), 0.02, jnp.float32)
        always = jnp.zeros(40, bool)
        groups = np.zeros((2, 40), bool)
        groups[0, :20] = True; groups[1, 20:] = True
        down, w = state.sample_states_mixture(
            jax.random.key(12), u, always, 20000, jnp.asarray(groups),
            5.0, 0.5)
        down = np.asarray(down); w = np.asarray(w, np.float64)
        cluster = down[:, :20].sum(axis=1) >= 4   # P_plain ~ 1e-3
        assert cluster.mean() > 5e-3               # oversampled
        assert w[cluster].max() < 1.0              # down-weighted
