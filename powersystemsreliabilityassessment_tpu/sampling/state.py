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


@partial(jax.jit, static_argnames=("batch", "antithetic"))
def sample_states(key: jax.Array, unavail: jax.Array, always_up: jax.Array,
                  batch: int, antithetic: bool = False) -> jax.Array:
    """Draw a batch of component failure indicators (1 = failed).

    Args:
      unavail: [n_comp] steady-state unavailability U.
      always_up: [n_comp] bool — components whose failure is neglected
        (mc_sampling.m:40-41 pins the synchronous condenser).
      antithetic: if True, the second half of the batch uses 1-u of the
        first half's uniforms (variance reduction for the scale-up config).

    Returns: bool [batch, n_comp].
    """
    n = unavail.shape[0]
    if antithetic:
        half = batch // 2
        u = jax.random.uniform(key, (half, n))
        u = jnp.concatenate([u, 1.0 - u], axis=0)
    else:
        u = jax.random.uniform(key, (batch, n))
    down = u < unavail[None, :]
    return down & ~always_up[None, :]
