"""Sequential Monte Carlo with explicit energy-limited-unit bookkeeping.

Replaces the scalar per-hour Julia loops of ``MCvsMarkovProcess.jl:210-284``
/ ``tail_risk.jl:12-91`` / ``generating_adequancy_comparative.jl:15-120``
with a ``lax.scan`` over hours (carrying each ELU's energy-used state)
vmapped over years. Semantics replicated exactly:

* per-hour i.i.d. availability draws ``rand() < q`` (the reference models
  hourly independence here, NOT a Markov chain);
* maintenance mask by week of year;
* continuous-normal load-forecast uncertainty ``load + randn() * sigma``;
* dispatch order: unlimited units first; if they cannot cover the load,
  energy-limited units discharge — proportionally to capacity if they can
  cover the remainder, otherwise "drain all" at full capacity and the rest
  is deficit (MCvsMarkovProcess.jl:252-266);
* a unit whose cumulative energy reaches its limit is exhausted for the
  remainder of the year.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

HOURS_PER_WEEK = 168


@partial(jax.jit, static_argnames=("n_years",))
def run_elu_mc(key: jax.Array, capacity: jax.Array, for_rate: jax.Array,
               maint_start: jax.Array, maint_weeks: jax.Array,
               energy_limit: jax.Array, base_load: jax.Array,
               lfu_sigma_mw: float, n_years: int):
    """Returns (yearly_lole [Y], hourly_failure_prob [H]).

    energy_limit: use jnp.inf for unlimited units.
    """
    H = base_load.shape[0]
    G = capacity.shape[0]
    is_elu = jnp.isfinite(energy_limit)
    week = jnp.minimum(jnp.arange(H) // HOURS_PER_WEEK + 1, 52)
    on_maint = ((maint_start[None, :] > 0)
                & (week[:, None] >= maint_start[None, :])
                & (week[:, None] < maint_start[None, :]
                   + maint_weeks[None, :]))              # [H, G]

    def one_year(k):
        ku, kl = jax.random.split(k)
        u = jax.random.uniform(ku, (H, G))
        fails = u < for_rate[None, :]                    # hourly i.i.d.
        load = base_load + lfu_sigma_mw * jax.random.normal(kl, (H,))

        def hour(carry, xs):
            energy_used = carry
            fail_h, maint_h, load_h = xs
            avail = ~fail_h & ~maint_h
            exhausted = is_elu & (energy_used >= energy_limit)
            cap_unl = jnp.sum(jnp.where(avail & ~is_elu, capacity, 0.0))
            elu_av = avail & is_elu & ~exhausted
            cap_elu = jnp.sum(jnp.where(elu_av, capacity, 0.0))

            unserved = jnp.maximum(load_h - cap_unl, 0.0)
            deficit = jnp.maximum(unserved - cap_elu, 0.0)
            # drain-all when short, proportional otherwise
            drain_all = unserved > cap_elu
            share = jnp.where(
                drain_all, capacity,
                unserved * capacity / jnp.maximum(cap_elu, 1e-9))
            use = jnp.where(elu_av & (unserved > 0), share, 0.0)
            energy_used = energy_used + use
            return energy_used, deficit

        _, deficits = jax.lax.scan(
            hour, jnp.zeros((G,)), (fails, on_maint, load))
        failed = deficits > 0
        return jnp.sum(failed.astype(jnp.float32)), failed

    keys = jax.random.split(key, n_years)
    lole_y, failed_yh = jax.vmap(one_year)(keys)
    hourly_prob = jnp.mean(failed_yh.astype(jnp.float32), axis=0)
    return lole_y, hourly_prob


def var_cvar(samples: jax.Array, alpha: float = 0.95):
    """Tail-risk metrics of an annual-index distribution: value-at-risk and
    conditional value-at-risk at level alpha (tail_risk.jl studies the
    annual-LOLE distribution vs. the analytical mean; VaR/CVaR quantify the
    tail the reference shows as a histogram)."""
    s = jnp.sort(samples)
    n = s.shape[0]
    idx = jnp.clip(jnp.int32(jnp.ceil(alpha * n)) - 1, 0, n - 1)
    var = s[idx]
    tail = jnp.where(jnp.arange(n) >= idx, s, 0.0)
    count = jnp.maximum(n - idx, 1)
    return var, jnp.sum(tail) / count
