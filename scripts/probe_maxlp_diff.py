"""Diagnose the 47 MW DNS difference between max_lp=256 and max_lp=128
production screened steps at case300s (results/r5_maxlp_pf.json): same
fixed batch through both configs, find differing lanes, dump their
state vectors + both DNS values, and (CPU-x64 subprocess) diff against
the float64 HiGHS oracle to name the wrong arm.

Usage: python scripts/probe_maxlp_diff.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import powersystemsreliabilityassessment_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines import dcopf
from powersystemsreliabilityassessment_tpu.sampling.state import sample_states
from powersystemsreliabilityassessment_tpu.utils.config import (
    CompatFlags, IPMConfig)


def main() -> None:
    key_salt = int(sys.argv[1]) if len(sys.argv) > 1 else 787306245
    case = cases.case300s()
    sys_ = build_system(case)
    B = 8192
    compat, ipm = CompatFlags(), IPMConfig()
    hint = dcopf.calibrate_shed_hint(sys_)
    hint_j = None if hint is None else jnp.asarray(hint, jnp.float32)
    rb = dcopf.default_repair_buffer(B, hinted=hint is not None)
    load = jnp.broadcast_to(sys_.load_pd[None, :], (B, sys_.n_load))
    pf = dcopf.default_pf_buffer(sys_, B)

    key = jax.random.key(key_salt + 31)    # acc key 0 of the probe
    down = sample_states(key, sys_.unavail, sys_.always_up_nsq, B)

    outs = {}
    for max_lp in (256, 128):
        res, n_over = jax.jit(
            lambda d, lp=max_lp: dcopf.evaluate_states_screened(
                sys_, d, load, lp, compat, ipm, "proportional",
                repair_buffer=rb, woodbury_k=4, shed_hint=hint_j,
                pf_buffer=pf))(down)
        outs[max_lp] = (np.asarray(res.dns_mw, np.float64), int(n_over),
                        np.asarray(res.primal_residual, np.float64))
        print(max_lp, "sum", outs[max_lp][0].sum(), "over", n_over)

    d256, d128 = outs[256][0], outs[128][0]
    diff = np.abs(d256 - d128)
    bad = np.argsort(diff)[::-1][:8]
    print("top differing lanes:")
    for i in bad:
        if diff[i] < 1e-3:
            break
        print(f"  lane {i}: dns256={d256[i]:.4f} dns128={d128[i]:.4f} "
              f"q256={outs[256][2][i]:.2e} q128={outs[128][2][i]:.2e} "
              f"n_out_br={int(np.asarray(down)[i, sys_.n_gen:].sum())} "
              f"n_out_gen={int(np.asarray(down)[i, :sys_.n_gen].sum())}")
    lanes = [int(i) for i in bad if diff[i] >= 1e-3]
    np.savez("/tmp/maxlp_diff_states.npz",
             down=np.asarray(down)[lanes], lanes=np.asarray(lanes),
             dns256=d256[lanes], dns128=d128[lanes])
    # f64 oracle in a CPU subprocess
    code = r"""
import numpy as np, sys
import jax; jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
from scipy.optimize import linprog
from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.core.system import build_system
from powersystemsreliabilityassessment_tpu.engines.dcopf import build_state_lp
from powersystemsreliabilityassessment_tpu.utils.config import CompatFlags, IPMConfig
z = np.load("/tmp/maxlp_diff_states.npz")
case = cases.case300s(); s = build_system(case, CompatFlags())
ng, nd = int(s.n_gen), int(s.load_pd.shape[0]); base = float(s.base_mva)
for st, lane, a, b in zip(z["down"], z["lanes"], z["dns256"], z["dns128"]):
    c, A, bb, l, u = build_state_lp(s, jnp.asarray(1.0 - st[:ng]),
                                    jnp.asarray(1.0 - st[ng:]),
                                    jnp.asarray(s.load_pd), CompatFlags(),
                                    IPMConfig().theta_max)
    r = linprog(np.asarray(c, np.float64), A_eq=np.asarray(A, np.float64),
                b_eq=np.asarray(bb, np.float64),
                bounds=list(zip(np.asarray(l, np.float64),
                                np.asarray(u, np.float64))),
                method="highs")
    dns = float(np.sum(r.x[ng:ng + nd])) * base if r.status == 0 else None
    print(f"lane {lane}: oracle={dns:.4f} dns256={a:.4f} dns128={b:.4f}")
"""
    subprocess.run([sys.executable, "-c", code], check=True)


if __name__ == "__main__":
    main()
