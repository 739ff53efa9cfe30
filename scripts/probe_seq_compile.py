"""Bisect the SEQ flat-step compile-time blowup (NEXT.md open investigation).

Times AOT compilation (.lower().compile(), no execution) of the 16-year
flat SEQ batch step. Variants ablate suspected contributors so the slow
pass can be localized:

  closure   - the study's exact step (load profile as closure constant)
  arg       - load-factor vector passed as a runtime argument
  nosample  - chronological sampler replaced by a Bernoulli draw
  evalonly  - screened evaluator alone on a flat [Y*H] batch (runtime
              comp_down/load inputs; no sampler, no reductions)
  samponly  - chronological sampler alone ([Y] keys -> down matrix)

Usage: PROBE_PLATFORM=tpu python scripts/probe_seq_compile.py [years] [variant]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# PROBE_PLATFORM=cpu forces local CPU compile; unset/"tpu" keeps the
# default backend (this environment's TPU registers as platform "axon",
# so jax_platforms must be left alone for TPU runs).
_plat = os.environ.get("PROBE_PLATFORM", "cpu")
if _plat == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from powersystemsreliabilityassessment_tpu.core import cases, load_profile
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines import dcopf
from powersystemsreliabilityassessment_tpu.models import twostate
from powersystemsreliabilityassessment_tpu.sampling import chronological
from powersystemsreliabilityassessment_tpu.studies import hl2_seq
from powersystemsreliabilityassessment_tpu.utils.config import (
    CompatFlags, IPMConfig)


def main():
    years = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    variant = sys.argv[2] if len(sys.argv) > 2 else "closure"
    hours = 8736
    max_lp = 256

    case = cases.rts24()
    compat = CompatFlags()
    ipm = IPMConfig()
    sys_ = build_system(case, compat)
    factors = load_profile.load_factors(hours, compat.weekday_mode)
    mt = twostate.mean_times(case)
    n_draws = chronological.default_num_draws(mt[:, 0], mt[:, 1], hours)

    mesh = Mesh(np.array(jax.devices()[:1]), ("scenarios",))
    fac = jnp.asarray(factors, sys_.bus_pd.dtype)
    t0 = time.perf_counter()

    if variant == "closure":
        step = hl2_seq.make_seq_batch_step(
            sys_, mesh, years, compat, ipm, hours, n_draws, max_lp,
            factors, None, nodal_mode="lp")
        lowered = step.jstep.lower(jax.random.key(0), *step.extra_args)
    elif variant == "arg":
        def device_step(key, fac):
            keys = jax.random.split(key, years)
            return hl2_seq._years_eval(
                sys_, compat, ipm, fac, hours, n_draws,
                max_lp * years, None, "lp", keys)

        step = jax.jit(shard_map(
            device_step, mesh=mesh, in_specs=(P(), P()),
            out_specs=(P(),) * 10, check_vma=False))
        lowered = step.lower(jax.random.key(0), fac)
    elif variant == "nosample":
        def device_step(key, fac):
            down_h = jax.random.bernoulli(
                key, 0.02, (years, hours, sys_.n_comp))
            load_h = fac[:, None] * sys_.load_pd[None, :]
            res, n_over = dcopf.evaluate_states_screened(
                sys_, down_h.reshape(years * hours, -1),
                jnp.tile(load_h, (years, 1)), max_lp * years, compat, ipm,
                "lp")
            dns = res.dns_mw.reshape(years, hours)
            return jnp.sum(dns, axis=1), n_over

        step = jax.jit(shard_map(
            device_step, mesh=mesh, in_specs=(P(), P()),
            out_specs=(P(), P()), check_vma=False))
        lowered = step.lower(jax.random.key(0), fac)
    elif variant == "evalonly":
        def f(down, load):
            res, n_over = dcopf.evaluate_states_screened(
                sys_, down, load, max_lp * years, compat, ipm, "lp")
            return res.dns_mw, n_over

        step = jax.jit(f)
        lowered = step.lower(
            jax.ShapeDtypeStruct((years * hours, sys_.n_comp), jnp.bool_),
            jax.ShapeDtypeStruct((years * hours, sys_.n_load), jnp.float32))
    elif variant == "samponly":
        def f(key):
            keys = jax.random.split(key, years)
            down = jax.vmap(lambda kk: chronological.sample_timeline(
                kk, sys_.mttf, sys_.mttr, hours, n_draws))(keys)
            return jnp.swapaxes(down, 1, 2).reshape(years * hours, -1)

        step = jax.jit(f)
        lowered = step.lower(jax.random.key(0))
    else:
        raise SystemExit(f"unknown variant {variant}")

    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    del compiled
    print(f"variant={variant} years={years} platform={jax.default_backend()} "
          f"trace+lower={t1-t0:.1f}s compile={t2-t1:.1f}s")


if __name__ == "__main__":
    main()
