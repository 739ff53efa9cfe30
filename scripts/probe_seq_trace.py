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
    concrete = all(not isinstance(a, jax.ShapeDtypeStruct) for a in args)
    t4 = t5 = t3

    def force(out):
        # block_until_ready is NOT a reliable fence on the pooled relay
        # (see .claude/skills/verify) — materialize every output to host.
        return [np.asarray(o) for o in jax.tree.leaves(out)]

    if concrete:
        force(comp(*args))
        t4 = time.perf_counter()
        force(comp(*args))
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


def _flat_eval_outputs(down_flat, load_flat, Y):
    res, n_over = dcopf.evaluate_states_screened(
        sys_, down_flat, load_flat, max_lp * Y, compat, ipm, "lp")
    dns = res.dns_mw.reshape(Y, hours)
    flag = dns > compat.seq_curtail_threshold_mw
    flag_f = flag.astype(dns.dtype)
    from powersystemsreliabilityassessment_tpu.engines import copper_sheet
    ens = jnp.sum(dns, axis=1)
    nlc = copper_sheet.count_curtailment_events(flag).astype(dns.dtype)
    nodal_yh = res.nodal_mw.reshape(Y, hours, -1)
    nodal = jnp.sum(jnp.where(flag[:, :, None], nodal_yh, 0.0), axis=1)
    down_h = down_flat.reshape(Y, hours, -1)
    comp_fail = jnp.einsum("yh,yhc->yc", flag_f,
                           down_h.astype(dns.dtype))
    return ens, nlc, nodal, comp_fail, n_over


def nosample():
    """Bernoulli states + full eval + reductions (no chronological)."""
    def f(key, sys, fac):
        down = jax.random.bernoulli(
            key, 0.02, (years * hours, sys.n_comp))
        load = jnp.tile(fac[:, None] * sys.load_pd[None, :], (years, 1))
        return _flat_eval_outputs(down, load, years)

    fac = jnp.asarray(factors, jnp.float32)
    timed("nosample", jax.jit(f), jax.random.key(0), sys_, fac)


def noeval():
    """Chronological sampler + reductions, certificates only (max_lp
    minimal so the LP block is one 128-lane tile)."""
    def f(key, sys, fac):
        keys = jax.random.split(key, years)
        down = jax.vmap(lambda kk: chronological.sample_timeline(
            kk, sys.mttf, sys.mttr, hours, n_draws))(keys)
        down_h = jnp.swapaxes(down, 1, 2).reshape(years * hours, -1)
        load = jnp.tile(fac[:, None] * sys.load_pd[None, :], (years, 1))
        res, n_over = dcopf.evaluate_states_screened(
            sys_, down_h, load, 128, compat, ipm, "lp")
        dns = res.dns_mw.reshape(years, hours)
        return jnp.sum(dns, axis=1), n_over

    fac = jnp.asarray(factors, jnp.float32)
    timed("noeval", jax.jit(f), jax.random.key(0), sys_, fac)


def shardsum():
    """Full _years_eval under shard_map, psum-only outputs."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    mesh = Mesh(np.array(jax.devices()[:1]), ("scenarios",))

    def f(key, sys, fac):
        keys = jax.random.split(key, years)
        outs = hl2_seq._years_eval(sys, compat, ipm, fac, hours, n_draws,
                                   max_lp * years, None, "lp", keys)
        return jax.lax.psum(jnp.sum(outs[0]), "scenarios")

    fac = jnp.asarray(factors, jnp.float32)
    jf = jax.jit(shard_map(f, mesh=mesh, in_specs=(P(), P(), P()),
                           out_specs=P(), check_vma=False))
    timed("shardsum", jf, jax.random.key(0), sys_, fac)


def shardgather():
    """Full _years_eval under shard_map, all_gather outputs (like the
    study step but no psum block)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    mesh = Mesh(np.array(jax.devices()[:1]), ("scenarios",))

    def f(key, sys, fac):
        keys = jax.random.split(key, years)
        outs = hl2_seq._years_eval(sys, compat, ipm, fac, hours, n_draws,
                                   max_lp * years, None, "lp", keys)
        g = lambda a: jax.lax.all_gather(a, "scenarios", tiled=True)
        return g(outs[0]), g(outs[1]), g(outs[2]), g(outs[3]), g(outs[4])

    fac = jnp.asarray(factors, jnp.float32)
    jf = jax.jit(shard_map(f, mesh=mesh, in_specs=(P(), P(), P()),
                           out_specs=(P(),) * 5, check_vma=False))
    timed("shardgather", jf, jax.random.key(0), sys_, fac)


def noshard():
    """Exactly _years_eval (no shard_map/collectives wrapper)."""
    def f(key, sys, fac):
        keys = jax.random.split(key, years)
        return hl2_seq._years_eval(sys, compat, ipm, fac, hours, n_draws,
                                   max_lp * years, None, "lp", keys)

    fac = jnp.asarray(factors, jnp.float32)
    timed("noshard", jax.jit(f), jax.random.key(0), sys_, fac)


if __name__ == "__main__":
    pieces = sys.argv[1:] or ["samponly", "solveonly", "evalonly", "closure"]
    print("backend:", jax.default_backend(), flush=True)
    for p in pieces:
        globals()[p]()
