"""Device mesh helpers: the scenario axis IS the data-parallel axis.

The reference's entire parallelism story is MATLAB ``parfor`` over sampled
states (nsqMain.m:257, seqMain.m:112). The TPU-native equivalent is a 1-D
``jax.sharding.Mesh`` over all chips with scenarios sharded along it;
index accumulation crosses the mesh as O(#indices) ``psum``s per batch
(SURVEY.md §5.8). There is no TP/PP/SP/EP analog in this domain — scenarios
are i.i.d. — so the mesh is deliberately one-dimensional.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenarios"


def scenario_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (SCENARIO_AXIS,))


_WARMED = False


def warmup_backend() -> None:
    """Absorb the pooled-TPU relay's per-process admission stall.

    Measured on this environment (scripts/probe_seq_trace.py + /tmp
    probes, 2026-08-17): the FIRST real execution a process sends
    through the relay can wait 2-19 minutes for admission when it is a
    large program (the SEQ study's first batch; even a 1 MB elementwise
    program reproduced an 18.6 min stall), while a trivial dispatch
    admits in ~1-15 s and every subsequent execution of any size runs
    immediately. Studies call this once before their first real batch so
    the stall lands on a no-op instead of the first result fetch.
    block_until_ready is not a reliable fence here — materialize.
    """
    global _WARMED
    if _WARMED:
        return
    import jax.numpy as jnp
    np.asarray(jax.jit(lambda x: x + 1.0)(jnp.zeros((8,), jnp.float32)))
    _WARMED = True


def shard_batch(mesh: Mesh, tree):
    """Place a batch pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
    return jax.device_put(tree, sharding)


def replicated(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
