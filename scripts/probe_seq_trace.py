"""Split trace vs lower time for the SEQ step's pieces (run alone!).

The compile-time blowup reproduces as ~180 s of trace+lower (XLA compile
is only ~15-25 s). This probe times .trace() and .lower() separately for
each suspect piece, sequentially in ONE quiet process:

  samponly   chronological sampler alone
  solveonly  fused-IPM structured solve alone (B=4096)
  evalonly   screened evaluator alone (flat 139776-lane batch)
  closure    the full study step

Usage: python scripts/probe_seq_trace.py [piece ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from powersystemsreliabilityassessment_tpu.core import cases, load_profile
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines import dcopf
from powersystemsreliabilityassessment_tpu.models import twostate
from powersystemsreliabilityassessment_tpu.sampling import chronological
from powersystemsreliabilityassessment_tpu.studies import hl2_seq
from powersystemsreliabilityassessment_tpu.utils.config import (
    CompatFlags, IPMConfig)

years, hours, max_lp = 16, 8736, 256
case = cases.rts24()
compat = CompatFlags()
ipm = IPMConfig()
sys_ = build_system(case, compat)
factors = load_profile.load_factors(hours, compat.weekday_mode)
mt = twostate.mean_times(case)
n_draws = chronological.default_num_draws(mt[:, 0], mt[:, 1], hours)


def timed(name, jitfn, *args):
    t0 = time.perf_counter()
    tr = jitfn.trace(*args)
    t1 = time.perf_counter()
    low = tr.lower()
    t2 = time.perf_counter()
    comp = low.compile()
    t3 = time.perf_counter()
    run = [a if isinstance(a, jax.Array) or not hasattr(a, 'shape')
           else a for a in args]
    concrete = all(not isinstance(a, jax.ShapeDtypeStruct) for a in args)
    t4 = t5 = t3
    if concrete:
        jax.block_until_ready(comp(*args))
        t4 = time.perf_counter()
        jax.block_until_ready(comp(*args))
        t5 = time.perf_counter()
    print(f"{name:10s} trace={t1-t0:7.1f}s lower={t2-t1:7.1f}s "
          f"compile={t3-t2:7.1f}s run1={t4-t3:7.1f}s run2={t5-t4:7.1f}s",
          flush=True)


def samponly():
    def f(key):
        keys = jax.random.split(key, years)
        down = jax.vmap(lambda kk: chronological.sample_timeline(
            kk, sys_.mttf, sys_.mttr, hours, n_draws))(keys)
        return jnp.swapaxes(down, 1, 2).reshape(years * hours, -1)

    timed("samponly", jax.jit(f), jax.random.key(0))


def solveonly():
    B = max_lp * years

    def f(down, load):
        return dcopf.evaluate_states(sys_, down, load, compat, ipm).dns_mw

    down = jnp.zeros((B, sys_.n_comp), jnp.bool_)
    load = jnp.broadcast_to(sys_.load_pd[None, :], (B, sys_.n_load)) * 1.0
    timed("solveonly", jax.jit(f), down, load)


def evalonly():
    def f(down, load):
        res, n_over = dcopf.evaluate_states_screened(
            sys_, down, load, max_lp * years, compat, ipm, "lp")
        return res.dns_mw, n_over

    down = jnp.zeros((years * hours, sys_.n_comp), jnp.bool_)
    load = jnp.broadcast_to(sys_.load_pd[None, :],
                            (years * hours, sys_.n_load)) * 1.0
    timed("evalonly", jax.jit(f), down, load)


def closure():
    mesh = Mesh(np.array(jax.devices()[:1]), ("scenarios",))
    step = hl2_seq.make_seq_batch_step(
        sys_, mesh, years, compat, ipm, hours, n_draws, max_lp,
        factors, None, nodal_mode="lp")
    timed("closure", step.jstep, jax.random.key(0), *step.extra_args)


if __name__ == "__main__":
    pieces = sys.argv[1:] or ["samponly", "solveonly", "evalonly", "closure"]
    print("backend:", jax.default_backend(), flush=True)
    for p in pieces:
        globals()[p]()
