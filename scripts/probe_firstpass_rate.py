"""One-off: measure certify_states' REAL first-pass certification rate
(repair_iters=0) and repair-needy lane count on a plain-MC RTS-24 peak
batch, against the fused kernel's quick pass on the same states.

Settles the round-3 discrepancy: default_repair_buffer's ~0.4%-needy
assumption vs the fused-kernel debug probe's 7.1% plain-check failures.
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
    from powersystemsreliabilityassessment_tpu.ops import (
        fused_sampler_cert as fsc)
    from powersystemsreliabilityassessment_tpu.sampling.state import (
        sample_states)
    from powersystemsreliabilityassessment_tpu.utils.config import CompatFlags

    sys_ = build_system(cases.rts24(), CompatFlags())
    B = 262144
    key = jax.random.key(11)
    down = sample_states(key, sys_.unavail, sys_.always_up_nsq, B)
    load = jnp.broadcast_to(sys_.load_pd[None, :], (B, sys_.n_load))

    ref0 = dcopf.certify_states(sys_, down, load, repair_iters=0,
                                woodbury_k=2)
    ref3 = dcopf.certify_states(sys_, down, load, repair_iters=3,
                                woodbury_k=2)
    _, ok1_k, _, _ = fsc.sample_certify_quick(key, sys_, B, down=down)

    c0 = np.asarray(ref0.certified)
    c3 = np.asarray(ref3.certified)
    k1 = np.asarray(ok1_k)
    n_out = np.asarray(jnp.sum(down[:, sys_.n_gen:].astype(jnp.float32),
                               axis=1))
    eligible = n_out <= 1
    deficit = np.asarray(ref0.deficit)
    out = {
        "batch": B,
        "cert0_frac": round(float(c0.mean()), 5),
        "cert3_frac": round(float(c3.mean()), 5),
        "kernel_ok1_frac": round(float(k1.mean()), 5),
        "needy_after_first": int((~c0 & eligible).sum()),
        "needy_after_repair": int((~c3).sum()),
        "kernel_needy": int((~k1).sum()),
        "deficit_pos_frac": round(float((deficit > 0).mean()), 5),
        "first_fail_deficit_pos": int((~c0 & eligible & (deficit > 0)).sum()),
        "first_fail_deficit_zero": int((~c0 & eligible
                                        & (deficit == 0)).sum()),
        "repair_rescued": int((c3 & ~c0).sum()),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
