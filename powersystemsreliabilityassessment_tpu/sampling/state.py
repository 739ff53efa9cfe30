"""Non-sequential (state-sampling) Monte Carlo engine.

Replaces ``Montecarlo_nsq_single/mc_sampling.m:24-45`` (rand matrix <
unavailability, sync condenser pinned up) with vectorized counter-based
PRNG over a ``[batch, n_comp]`` block: every batch is derived from a
``fold_in`` of the study key, so runs are deterministic, reproducible and
order-independent across devices (the reference mains are unseeded;
SURVEY.md §4.3).

Note the framework does NOT keep the reference's unique-state dedup
database (nsqMain.m:219-245): on TPU, re-evaluating duplicate states in a
dense batch is cheaper than host-side dedup bookkeeping, and the estimator
is identical in expectation (SURVEY.md §7 layer 7).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("batch", "antithetic", "rng_impl"))
def sample_states(key: jax.Array, unavail: jax.Array, always_up: jax.Array,
                  batch: int, antithetic: bool = False,
                  rng_impl: str = "threefry") -> jax.Array:
    """Draw a batch of component failure indicators (1 = failed).

    Args:
      unavail: [n_comp] steady-state unavailability U.
      always_up: [n_comp] bool — components whose failure is neglected
        (mc_sampling.m:40-41 pins the synchronous condenser).
      antithetic: if True, the second half of the batch uses 1-u of the
        first half's uniforms (variance reduction for the scale-up config).
      rng_impl: "threefry" (default; counter-based, the reproducibility
        contract — same seed, same states on every backend) or "hw" (the
        TPU core's hardware PRNG via a Pallas kernel; same Bernoulli
        distribution, different stream; falls back to threefry off-TPU
        AND when ``antithetic=True`` — the hw kernel draws raw bits with
        no reusable uniforms to mirror, so antithetic pairing always
        uses the threefry path). Any other value raises ValueError.
        NOTE: "hw" measured SLOWER in the full production step — the
        Pallas call is a fusion barrier; see ops/hw_sampler.py for the
        A/B. Kept for workloads that consume raw state batches.

    Returns: bool [batch, n_comp].
    """
    if rng_impl not in ("threefry", "hw"):
        raise ValueError(f"unknown rng_impl {rng_impl!r}; "
                         "expected 'threefry' or 'hw'")
    n = unavail.shape[0]
    if rng_impl == "hw" and not antithetic:
        from ..ops import hw_sampler
        if hw_sampler.available():
            return hw_sampler.sample_states_hw(key, unavail, always_up,
                                               batch)
    if antithetic:
        half = (batch + 1) // 2
        u = jax.random.uniform(key, (half, n))
        # Trim preserves the requested batch size for odd batches (the
        # last sample is then unpaired — a vanishing perturbation of the
        # variance-reduction pairing, not of the estimator).
        u = jnp.concatenate([u, 1.0 - u], axis=0)[:batch]
    else:
        u = jax.random.uniform(key, (batch, n))
    down = u < unavail[None, :]
    return down & ~always_up[None, :]


@partial(jax.jit, static_argnames=("batch",))
def sample_states_importance(key: jax.Array, unavail: jax.Array,
                             always_up: jax.Array, batch: int,
                             boost: float,
                             boost_mask: jax.Array | None = None,
                             q_override: jax.Array | None = None):
    """Importance-sampled state draw: failure-biased proposal + weights.

    Variance reduction for rare-event regimes the reference's plain MC
    (mc_sampling.m) handles poorly: components are drawn from the
    proposal q_i = min(boost * U_i, 0.5) instead of their true
    unavailability U_i, so multi-outage states appear ~boost^k more
    often; each state carries its exact likelihood ratio

        w = prod_i (U_i/q_i)^x_i ((1-U_i)/(1-q_i))^(1-x_i)

    and every index estimated as a w-weighted mean is unbiased
    (E_q[w f(X)] = E_p[f(X)]). Pinned (always-up) components are fixed
    under both measures, so they contribute factor 1.

    ``boost_mask`` ([n_comp] bool, optional) restricts the boost to a
    subset of components: where the mask is False, q_i = U_i exactly
    (likelihood-ratio factor 1 — those components are sampled from the
    true measure). Use case: capacity-driven rare events at
    transmission scale (case300) want GENERATOR outages boosted while
    branch outages stay at plain rates, so the tier-1 certificate's
    n_out <= woodbury_k eligibility keeps its ~99% closure instead of
    collapsing under boosted multi-branch states.

    ``q_override`` ([n_comp], optional) supplies the proposal rates
    directly (ignoring ``boost``/``boost_mask``): the per-component
    tilt of the cross-entropy adaptive scheme
    (hl2_nsq.calibrate_ce_proposal). Values are clamped to
    [unavail, 0.5] — the proposal never under-samples a component's
    failure (which would put likelihood ratios > 1 on failure events).

    Returns (down bool [batch, n_comp], weight f32 [batch]).
    """
    n = unavail.shape[0]
    if q_override is not None:
        q = jnp.clip(q_override, unavail, jnp.maximum(unavail, 0.5))
    else:
        q = jnp.minimum(boost * unavail, 0.5)
        if boost_mask is not None:
            q = jnp.where(boost_mask, q, unavail)
    q = jnp.where(always_up, 0.0, q)
    p = jnp.where(always_up, 0.0, unavail)
    u = jax.random.uniform(key, (batch, n))
    down = (u < q[None, :]) & ~always_up[None, :]
    # log-space product of per-component ratios. Pinned components AND
    # zero-unavailability components contribute factor 1: with p = q = 0
    # the component never fails under either measure, and leaving the
    # -inf log-ratio in place would turn the (never-taken) failure term
    # into 0 * -inf = NaN through the matmul.
    never = always_up | (unavail <= 0.0)
    safe_q = jnp.maximum(q, 1e-30)
    log_fail = jnp.where(never, 0.0, jnp.log(p / safe_q))
    log_ok = jnp.where(never, 0.0,
                       jnp.log((1.0 - p) / jnp.maximum(1.0 - q, 1e-30)))
    x = down.astype(unavail.dtype)
    logw = x @ log_fail + (1.0 - x) @ log_ok
    return down, jnp.exp(logw)
