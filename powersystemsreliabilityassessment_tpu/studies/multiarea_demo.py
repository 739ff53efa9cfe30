"""Two-area interconnected adequacy study (run_adequacy_assessmentII.jl).

ISOLATED vs INTERCONNECTED support-policy comparison on the reference demo
system (AdequacyAssessmentII.jl:256-291): a "rich" area (5x400 MW) and a
"poor" area (5x200 MW) joined by a 200 MW tie; interconnection must reduce
both areas' risk (the policy comparison doubles as a sanity check,
SURVEY.md §4.1).
"""
from __future__ import annotations

import numpy as np

from powersystemsreliabilityassessment_tpu.engines import multiarea


def demo_system(hours: int = 8760) -> multiarea.MultiAreaSystem:
    h = np.linspace(0, 2 * np.pi, hours)
    return multiarea.MultiAreaSystem(
        area_names=["Area_Rich", "Area_Poor"],
        gen_capacity=[np.full(5, 400.0), np.full(5, 200.0)],
        gen_mttf=[np.full(5, 1000.0), np.full(5, 900.0)],
        gen_mttr=[np.full(5, 50.0), np.full(5, 60.0)],
        hourly_load=np.stack([1000.0 + 500.0 * np.sin(h),
                              800.0 + 400.0 * np.sin(h)]),
        tie_from=np.array([0], np.int32),
        tie_to=np.array([1], np.int32),
        tie_cap=np.array([200.0]),
    )


def run_demo(n_years: int = 100, seed: int = 0, hours: int = 8760) -> dict:
    sys = demo_system(hours)
    results = {}
    for policy in (multiarea.ISOLATED, multiarea.INTERCONNECTED):
        lole, eue = multiarea.run_multiarea_sequential(
            sys, policy, n_years, seed=seed)
        results[policy] = {"lole": lole.tolist(), "eue": eue.tolist()}

    print("\n=== MULTI-AREA COMPARISON ===")
    print(f"{'Policy':<15} | {'Area':<10} | {'LOLE (h/yr)':>11} | "
          f"{'EUE (MWh/yr)':>12}")
    print("-" * 60)
    for policy, res in results.items():
        for a, name in enumerate(sys.area_names):
            print(f"{policy:<15} | {name:<10} | {res['lole'][a]:>11.2f} | "
                  f"{res['eue'][a]:>12.2f}")
    return results


def rts96_three_area_system(hours: int = 8736) -> "multiarea.MultiAreaSystem":
    """HL1.5 view of RTS-96: three RTS-24 areas, aggregate tie capacities
    from the published inter-area connections (A-B: 1175 MW over three
    ties, B-C: 500, C-A: 500), RTS-79 chronological loads per area."""
    import numpy as np

    from powersystemsreliabilityassessment_tpu.core import cases, load_profile

    case = cases.rts24()
    factors = load_profile.load_factors(hours)
    load = (load_profile.PEAK_MW * factors).astype(np.float64)
    gens = case.gen_pmax[case.gen_pmax > 0]
    mttf = case.gen_mttf[case.gen_pmax > 0]
    mttr = case.gen_mttr[case.gen_pmax > 0]
    return multiarea.MultiAreaSystem(
        area_names=["A", "B", "C"],
        gen_capacity=[gens, gens, gens],
        gen_mttf=[mttf, mttf, mttf],
        gen_mttr=[mttr, mttr, mttr],
        hourly_load=np.stack([load, load, load]),
        tie_from=np.array([0, 1, 2], np.int32),
        tie_to=np.array([1, 2, 0], np.int32),
        tie_cap=np.array([1175.0, 500.0, 500.0]),
    )


def run_rts96_hl15(n_years: int = 50, seed: int = 0,
                   hours: int = 8736) -> dict:
    """Three-area generation-adequacy comparison on the RTS-96 topology."""
    sys = rts96_three_area_system(hours)
    out = {}
    for policy in (multiarea.ISOLATED, multiarea.INTERCONNECTED):
        lole, eue = multiarea.run_multiarea_sequential(
            sys, policy, n_years, seed=seed)
        out[policy] = {"lole": lole.tolist(), "eue": eue.tolist()}
    return out
