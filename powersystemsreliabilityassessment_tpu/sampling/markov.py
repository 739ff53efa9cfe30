"""Per-hour Markov-transition sampling (the educational engines' method).

Replicates ``GeneratingAdequacy/Markov_process.jl:172-195`` (per-hour
Bernoulli transitions with p01 = 1-exp(-lambda dt), p10 = 1-exp(-mu dt))
as a ``lax.scan`` over hours carrying the component state vector. This
engine's stationary distribution matches the state-duration sampler; the
dwell-time distribution is geometric rather than rounded-exponential
(SURVEY.md §7 hard part 2 quantifies the difference in tests).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("hours",))
def sample_markov_chain(key: jax.Array, p_fail: jax.Array,
                        p_repair: jax.Array, hours: int,
                        init_down: jax.Array | None = None) -> jax.Array:
    """bool [n_comp, hours], True = DOWN. Components start UP by default."""
    n = p_fail.shape[0]
    if init_down is None:
        init_down = jnp.zeros((n,), bool)

    def step(state_down, k):
        u = jax.random.uniform(k, (n,))
        fail = ~state_down & (u < p_fail)
        repair = state_down & (u < p_repair)
        new = (state_down | fail) & ~repair
        return new, new

    keys = jax.random.split(key, hours)
    _, path = jax.lax.scan(step, init_down, keys)
    return path.T  # [n, hours]


@partial(jax.jit, static_argnames=("hours", "batch"))
def sample_markov_chain_batch(key, p_fail, p_repair, hours: int, batch: int):
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: sample_markov_chain(
        k, p_fail, p_repair, hours))(keys)
