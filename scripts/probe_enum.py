"""Enumeration-hybrid measurement on real TPU (results/enum_hybrid.json).

(a) Tail-variance curve: how much of the plain-MC EDNS variance lives in
    states with more than k outages — the variance a k-th order
    enumeration pre-pass removes (it carries the <=k mass exactly).
(b) Study A/B at equal sample budget: run_nsq_study plain vs
    enum_order=4, same seed; reports beta, EDNS and wall time
    (pre-pass included).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def tail_curve(orders=(2, 3, 4, 5, 6), batches=8, B=262144):
    from powersystemsreliabilityassessment_tpu.core import cases
    from powersystemsreliabilityassessment_tpu.core.system import build_system
    from powersystemsreliabilityassessment_tpu.engines import dcopf
    from powersystemsreliabilityassessment_tpu.sampling.state import (
        sample_states)
    from powersystemsreliabilityassessment_tpu.utils.config import (
        CompatFlags, IPMConfig)

    compat, ipm = CompatFlags(), IPMConfig()
    sys_ = build_system(cases.rts24(), compat)

    @jax.jit
    def step(key):
        down = sample_states(key, sys_.unavail, sys_.always_up_nsq, B)
        load = jnp.broadcast_to(sys_.load_pd[None, :], (B, sys_.n_load))
        res, _ = dcopf.evaluate_states_screened(
            sys_, down, load, 2048, compat, ipm, "proportional")
        return res.dns_mw, jnp.sum(down, axis=1).astype(jnp.int32)

    dns, nd = [], []
    for i in range(batches):
        d, n = step(jax.random.key(100 + i))
        dns.append(np.asarray(d, np.float64))
        nd.append(np.asarray(n))
    dns, nd = np.concatenate(dns), np.concatenate(nd)
    var = float(dns.var())
    out = {"samples": int(dns.size), "edns": round(float(dns.mean()), 4),
           "var": round(var, 1), "orders": {}}
    for k in orders:
        t = dns * (nd > k)
        tv = float((t**2).mean() - t.mean()**2)
        out["orders"][k] = {"tail_edns": round(float(t.mean()), 4),
                            "tail_var": round(tv, 2),
                            "variance_reduction": round(var / tv, 2)}
    return out


def study_ab(samples=16384, order=4, seed=3):
    from powersystemsreliabilityassessment_tpu.core import cases
    from powersystemsreliabilityassessment_tpu.studies.hl2_nsq import (
        run_nsq_study)
    from powersystemsreliabilityassessment_tpu.utils.config import MCSConfig

    cfg = MCSConfig(batch_size=8192, max_samples=samples, beta_limit=0.0,
                    seed=seed)
    out = {}
    for label, k in (("plain", 0), (f"enum{order}", order)):
        t0 = time.perf_counter()
        res = run_nsq_study(cases.rts24(), cfg, log_every=0, enum_order=k)
        out[label] = {"edns": round(res.edns_mw, 4),
                      "beta": round(res.beta, 6),
                      "lole": round(res.lole_hr_yr, 2),
                      "wall_s": round(time.perf_counter() - t0, 1),
                      "enum_states": res.enum_states,
                      "enum_mass": round(res.enum_mass, 6),
                      "enum_edns_exact": round(res.enum_edns_exact_mw, 4)}
    out["beta_ratio"] = round(out["plain"]["beta"]
                              / out[f"enum{order}"]["beta"], 2)
    return out


def main() -> None:
    out = {"tail_curve": tail_curve(), "study_ab": study_ab()}
    os.makedirs("results", exist_ok=True)
    with open("results/enum_hybrid.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
