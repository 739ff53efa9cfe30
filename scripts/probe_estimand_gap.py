"""Quantify the SEQ estimand gap: reference semantics vs stationary CV.

The control-variate SEQ mode (studies/hl2_seq.py control_variate=True)
samples stationary-start years with continuous dwells; the reference
path (seq_mcsampling.m:44-75) starts all-up and quantizes dwells
(round TTF / ceil TTR). Both target "annual indices of the two-state
fleet", but the estimands differ by two small, computable effects,
evaluated here EXACTLY at the copper-sheet level (f64 COPT; network
effects are %-level corrections on top and shift both estimands alike):

1. **All-up January transient**: from an all-up start the per-unit
   down-probability is p_i(t) = U_i (1 - exp(-t/tau_i)),
   tau_i = mttf*mttr/(mttf+mttr) (models/twostate.availability_evolution
   closed form). A per-hour COPT over the time-varying p_i(t) gives the
   exact transient EENS/LOLE vs the stationary table.
2. **Dwell quantization**: round/ceil changes the long-run unavailability
   to U_q = E[ceil TTR] / (E[round TTF] + E[ceil TTR]) with
   E[ceil X] = 1/(1-e^(-1/m)) and
   E[round X] = sum_k e^(-(k-1/2)/m) = e^(-1/(2m))/(1-e^(-1/m))
   for exponential X with mean m (renewal-reward on the quantized
   alternating renewal process).

Usage: python scripts/probe_estimand_gap.py   (host-only, ~1 min)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import powersystemsreliabilityassessment_tpu as psra  # noqa: F401
from powersystemsreliabilityassessment_tpu.core import cases, load_profile
from powersystemsreliabilityassessment_tpu.engines import copt
from powersystemsreliabilityassessment_tpu.models import twostate
from powersystemsreliabilityassessment_tpu.utils.config import CompatFlags


def copt_nonstationary(caps, p_t, loads, thresh, step=1.0):
    """Per-hour COPT over time-varying unit probabilities p_t [H, ng]."""
    n = int(np.ceil(caps.sum() / step)) + 1
    ks = np.round(caps / step).astype(int)
    eue = np.zeros(len(loads))
    lolp = np.zeros(len(loads))
    x = np.arange(n) * step
    total = caps.sum()
    for h in range(len(loads)):
        probs = np.zeros(n)
        probs[0] = 1.0
        for k, qq in zip(ks, p_t[h]):
            shifted = np.zeros(n)
            if k:
                shifted[k:] = probs[:n - k]
            else:
                shifted = probs
            probs = (1.0 - qq) * probs + qq * shifted
        s0 = np.concatenate([np.cumsum(probs[::-1])[::-1], [0.0]])
        s1 = np.concatenate([np.cumsum((probs * x)[::-1])[::-1], [0.0]])
        r = total - loads[h]
        i = int(np.clip(np.floor(r / step) + 1, 0, n))
        eue[h] = s1[i] - r * s0[i]
        i2 = int(np.clip(np.floor((r + thresh) / step) + 1, 0, n))
        lolp[h] = s0[i2]
    return eue, lolp


def main():
    case = cases.rts24()
    compat = CompatFlags()
    hours = 8736
    factors = np.asarray(load_profile.load_factors(
        hours, compat.weekday_mode), np.float64)
    loads = factors * float(case.bus_pd.sum())
    caps = np.asarray(case.gen_pmax, np.float64)
    mttf = np.asarray(case.gen_mttf, np.float64)
    mttr = np.asarray(case.gen_mttr, np.float64)
    u = mttr / (mttf + mttr)
    thresh = compat.seq_curtail_threshold_mw

    mu_e, mu_l, _, _ = copt.copper_cv_means(caps, u, loads, thresh_mw=thresh)
    print(f"stationary copper:        EENS {mu_e:9.3f} MWh/yr | "
          f"LOLE {mu_l:7.4f} h/yr")

    # 1. all-up transient (exact, time-varying per-hour COPT).
    tau = mttf * mttr / (mttf + mttr)
    t = np.arange(hours, dtype=np.float64)
    p_t = u[None, :] * (1.0 - np.exp(-t[:, None] / tau[None, :]))
    eue_h, lolp_h = copt_nonstationary(caps, p_t, loads, thresh)
    print(f"all-up start (reference): EENS {eue_h.sum():9.3f} MWh/yr | "
          f"LOLE {lolp_h.sum():7.4f} h/yr | transient delta "
          f"{100 * (eue_h.sum() / mu_e - 1):+.2f}% / "
          f"{100 * (lolp_h.sum() / mu_l - 1):+.2f}%")

    # 2. dwell quantization (long-run U shift).
    e_ceil = 1.0 / (1.0 - np.exp(-1.0 / mttr))
    e_round = np.exp(-0.5 / mttf) / (1.0 - np.exp(-1.0 / mttf))
    u_q = e_ceil / (e_round + e_ceil)
    mu_e_q, mu_l_q, _, _ = copt.copper_cv_means(caps, u_q, loads,
                                                thresh_mw=thresh)
    print(f"quantized dwells:         EENS {mu_e_q:9.3f} MWh/yr | "
          f"LOLE {mu_l_q:7.4f} h/yr | quantization delta "
          f"{100 * (mu_e_q / mu_e - 1):+.2f}% / "
          f"{100 * (mu_l_q / mu_l - 1):+.2f}%")
    print(f"max |U_q - U|: {np.abs(u_q - u).max():.2e} "
          f"(rel {np.abs(u_q / u - 1).max():.2e})")

    # combined reference-semantics estimand (quantized U + transient).
    p_tq = u_q[None, :] * (1.0 - np.exp(-t[:, None] / tau[None, :]))
    eue_q, lolp_q = copt_nonstationary(caps, p_tq, loads, thresh)
    print(f"combined (ref estimand):  EENS {eue_q.sum():9.3f} MWh/yr | "
          f"LOLE {lolp_q.sum():7.4f} h/yr | total delta "
          f"{100 * (eue_q.sum() / mu_e - 1):+.2f}% / "
          f"{100 * (lolp_q.sum() / mu_l - 1):+.2f}%")


if __name__ == "__main__":
    main()
