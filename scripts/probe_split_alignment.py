"""How well does the copper-margin trigger cover the ENS-carrying years?

For the splitting study to reduce variance, years carrying ENS must
ENTER the splitting level (un-entered years keep their plain estimate
and their full variance). This probe samples years, evaluates them, and
reports the alignment between {entered} and {ENS > 0}: the fraction of
shed years entered, and the fraction of total ENS carried by entered
years. A low ENS-mass coverage means the trigger misses a failure mode
(e.g. transmission-driven shed that needs no capacity deficit).

Usage: python scripts/probe_split_alignment.py [--load-scale 0.8]
       [--level 250] [--years 512]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import powersystemsreliabilityassessment_tpu as psra  # noqa: F401
import jax
import jax.numpy as jnp

from powersystemsreliabilityassessment_tpu.core import cases, load_profile
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines import dcopf
from powersystemsreliabilityassessment_tpu.models import twostate
from powersystemsreliabilityassessment_tpu.sampling import chronological
from powersystemsreliabilityassessment_tpu.utils.config import (
    CompatFlags, IPMConfig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load-scale", type=float, default=0.8)
    ap.add_argument("--level", type=float, default=250.0)
    ap.add_argument("--years", type=int, default=512)
    ap.add_argument("--hours", type=int, default=8736)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    case = cases.rts24()
    compat, ipm = CompatFlags(), IPMConfig()
    sys_ = build_system(case, compat)
    hours = args.hours
    fac = np.asarray(load_profile.load_factors(hours, compat.weekday_mode),
                     np.float32) * args.load_scale
    mt = twostate.mean_times(case)
    n_draws = chronological.default_num_draws(mt[:, 0], mt[:, 1], hours)
    ng = int(sys_.n_gen)
    Y = args.batch
    level_pu = args.level / float(sys_.base_mva)
    facd = jnp.asarray(fac)

    @jax.jit
    def batch(key, sys):
        keys = jax.random.split(key, Y)
        down = jax.vmap(lambda kk: chronological.sample_timeline(
            kk, sys.mttf, sys.mttr, hours, n_draws,
            quantize=False))(keys)                   # [Y, ncomp, H]
        up = 1.0 - down[:, :ng, :].astype(jnp.float32)
        cap = jnp.einsum("ygh,g->yh", up, sys.gen_pmax)
        margin = cap - facd[None, :] * jnp.sum(sys.load_pd)
        entered = jnp.any(margin < level_pu, axis=1)
        down_h = jnp.swapaxes(down, 1, 2)
        load_pu = facd[None, :, None] * sys.load_pd[None, None, :]
        load_pu = jnp.broadcast_to(load_pu, (Y, hours, sys.load_pd.shape[0]))
        res, _ = dcopf.evaluate_states_screened(
            sys, down_h.reshape(Y * hours, -1),
            load_pu.reshape(Y * hours, -1), 64 * Y, compat, ipm, "none")
        ens = jnp.sum(res.dns_mw.reshape(Y, hours), axis=1)
        return entered, ens

    root = jax.random.key(args.seed)
    E, S = [], []
    for b in range(args.years // Y):
        e, s = batch(jax.random.fold_in(root, b), sys_)
        E.append(np.asarray(e)), S.append(np.asarray(s))
    e = np.concatenate(E)
    s = np.concatenate(S)
    shed = s > 1e-6
    print(f"load={args.load_scale} level={args.level}: years {len(e)}, "
          f"entered {e.mean():.3f}, shed-years {shed.mean():.3f}")
    if shed.any():
        print(f"  P(entered | shed year)      = {e[shed].mean():.3f}")
        print(f"  ENS mass in entered years   = "
              f"{s[e].sum() / s.sum():.3f}")
        print(f"  mean ENS entered/not        = "
              f"{s[e].mean():.2f} / {s[~e].mean():.2f} MWh")
        print(f"  var ENS entered/not         = "
              f"{s[e].var():.1f} / {s[~e].var():.1f}")


if __name__ == "__main__":
    main()
