"""Can ONE static shed pattern certify the deficit>0 lanes first-pass?

83% of deficit>0 lanes at RTS-24 peak fail the first post-outage flow
check under the load-proportional shed and are then rescued by <=3
repair iterations (scripts/probe_firstpass_rate.py). If the repaired
patterns are structurally similar across states, a single precomputed
hint pattern would collapse the repair-needy fraction from ~7% to ~1%,
shrinking the compaction buffers and the fused kernel's finish set.

Method:
  1. sample a batch; run the full certificate; collect the repaired
     shed of lanes that FAILED the first check but repaired OK;
  2. mean-normalize those sheds into one pattern;
  3. re-run certify_states(repair_iters=0, shed_hint=pattern) on a
     FRESH batch; report the first-pass rate vs the proportional
     candidate's.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from powersystemsreliabilityassessment_tpu.core import cases
    from powersystemsreliabilityassessment_tpu.core.system import build_system
    from powersystemsreliabilityassessment_tpu.engines import dcopf
    from powersystemsreliabilityassessment_tpu.sampling.state import (
        sample_states)
    from powersystemsreliabilityassessment_tpu.utils.config import CompatFlags

    sys_ = build_system(cases.rts24(), CompatFlags())
    B = 65536
    load = jnp.broadcast_to(sys_.load_pd[None, :], (B, sys_.n_load))

    # 1-2: harvest repaired sheds on the calibration batch
    key = jax.random.key(21)
    down = sample_states(key, sys_.unavail, sys_.always_up_nsq, B)
    ref0 = dcopf.certify_states(sys_, down, load, repair_iters=0)
    ref3 = dcopf.certify_states(sys_, down, load, repair_iters=3)
    c0 = np.asarray(ref0.certified)
    c3 = np.asarray(ref3.certified)
    rescued = c3 & ~c0
    shed3 = np.asarray(ref3.shed)[rescued]
    tot = shed3.sum(axis=1, keepdims=True)
    pat = (shed3 / np.maximum(tot, 1e-9)).mean(axis=0)
    pat = pat / pat.sum()

    out = {"batch": B, "n_rescued_cal": int(rescued.sum()),
           "pattern": [round(float(x), 5) for x in pat],
           "prop_pattern": [round(float(x), 5) for x in np.asarray(
               sys_.load_pd / sys_.load_pd.sum())]}

    # 3: fresh batch, first-pass rate with the hint
    key2 = jax.random.key(22)
    down2 = sample_states(key2, sys_.unavail, sys_.always_up_nsq, B)
    hint = jnp.broadcast_to(jnp.asarray(pat, jnp.float32)[None, :],
                            (B, sys_.n_load))
    r0_prop = dcopf.certify_states(sys_, down2, load, repair_iters=0)
    r0_hint = dcopf.certify_states(sys_, down2, load, repair_iters=0,
                                   shed_hint=hint)
    r3_hint = dcopf.certify_states(sys_, down2, load, repair_iters=3,
                                   shed_hint=hint)
    r3_prop = dcopf.certify_states(sys_, down2, load, repair_iters=3)
    for name, r in (("prop_r0", r0_prop), ("hint_r0", r0_hint),
                    ("prop_r3", r3_prop), ("hint_r3", r3_hint)):
        c = np.asarray(r.certified)
        out[name] = {"cert_frac": round(float(c.mean()), 5),
                     "needy": int((~c).sum())}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
