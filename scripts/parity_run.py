"""Full parity run against the reference baselines (BASELINE.md).

NSQ: 100k samples at fixed peak load (nsqMain.m config: beta target 0.0017,
max 100,000 samples — the reference hit the cap at beta 0.0145).
SEQ: chronological years to CoV < 0.05 (seqMain.m config; reference
converged at 1245 years).

Writes PARITY.md with a side-by-side table and exports the reference-schema
CSVs under results/.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from powersystemsreliabilityassessment_tpu.core import cases
from powersystemsreliabilityassessment_tpu.studies.hl2_nsq import run_nsq_study
from powersystemsreliabilityassessment_tpu.studies.hl2_seq import run_seq_study
from powersystemsreliabilityassessment_tpu.utils import report
from powersystemsreliabilityassessment_tpu.utils.config import MCSConfig

REF = {
    "nsq": {"edns": 14.8894, "lole": 735.93, "beta": 0.01451,
            "nodal_top": {6: 25233.6, 15: 9771.0, 18: 9369.0},
            "comp_top": {24: 0.535, 23: 0.532, 33: 0.302}},
    "seq": {"eens": 4266.87, "lole": 14.331, "lolf": 2.465,
            "plc": 1.640e-3, "edns": 0.4884, "years": 1245,
            "nodal_top": {18: 499.70, 15: 433.75, 13: 339.35},
            "comp_top": {23: 0.644, 24: 0.638, 33: 0.420, 44: 0.223}},
}


def main():
    case = cases.rts24()
    os.makedirs("results", exist_ok=True)
    lines = ["# PARITY — TPU framework vs reference baselines",
             "", "Produced by `scripts/parity_run.py` on real TPU hardware.",
             ""]

    t0 = time.time()
    nsq = run_nsq_study(case, MCSConfig(batch_size=8192, max_samples=100_000,
                                        seed=2024), log_every=10)
    t_nsq = time.time() - t0
    report.export_nodal_csv("results/nodal_results.csv",
                            nsq.nodal_eens_mwh_yr)
    report.export_json("results/nsq_results.json", nsq.to_dict())

    r = REF["nsq"]
    lines += [
        "## HL2 non-sequential MCS (100k samples, fixed peak load)", "",
        "| Metric | Reference | Ours | Delta |",
        "|---|---|---|---|",
        f"| EDNS (MW) | {r['edns']} | {nsq.edns_mw:.4f} | "
        f"{(nsq.edns_mw - r['edns']) / r['edns'] * 100:+.2f}% |",
        f"| LOLE (hr/yr, peak basis) | {r['lole']} | {nsq.lole_hr_yr:.2f} | "
        f"{(nsq.lole_hr_yr - r['lole']) / r['lole'] * 100:+.2f}% |",
        f"| final beta | {r['beta']} | {nsq.beta:.5f} | — |",
        f"| samples | 100000 | {nsq.samples} | — |",
        f"| wall clock | n/a | {t_nsq:.1f} s (single chip) | — |",
        "",
        "Top nodal EENS (MWh/yr):",
        "",
        "| Bus | Reference | Ours |", "|---|---|---|",
    ]
    for bus, val in r["nodal_top"].items():
        lines.append(f"| {bus} | {val} | "
                     f"{nsq.nodal_eens_mwh_yr[bus - 1]:.1f} |")
    lines += ["", "Critical components P(down | failure):", "",
              "| Component | Reference | Ours |", "|---|---|---|"]
    for comp, val in r["comp_top"].items():
        lines.append(f"| {comp} | {val} | "
                     f"{nsq.comp_importance[comp - 1]:.3f} |")

    print(f"NSQ done in {t_nsq:.1f}s: EDNS {nsq.edns_mw:.4f} "
          f"LOLE {nsq.lole_hr_yr:.2f} beta {nsq.beta:.5f} "
          f"overflow {nsq.overflow_states}")

    t0 = time.time()
    seq = run_seq_study(case, MCSConfig(max_years=4000, cov_threshold=0.05,
                                        seed=7), years_per_device=8,
                        max_lp=512, log_every=5)
    t_seq = time.time() - t0
    report.export_nodal_csv("results/seq_nodal_results.csv",
                            seq.nodal_eens_mwh_yr)
    report.export_json("results/seq_results.json", seq.to_dict())

    r = REF["seq"]
    lines += [
        "", "## HL2 sequential MCS (RTS-79 chronological load, CoV<0.05)",
        "",
        "| Metric | Reference | Ours | Delta |",
        "|---|---|---|---|",
        f"| EENS (MWh/yr) | {r['eens']} | {seq.eens_mwh_yr:.2f} | "
        f"{(seq.eens_mwh_yr - r['eens']) / r['eens'] * 100:+.2f}% |",
        f"| LOLE (hr/yr) | {r['lole']} | {seq.lole_hr_yr:.3f} | "
        f"{(seq.lole_hr_yr - r['lole']) / r['lole'] * 100:+.2f}% |",
        f"| LOLF (occ/yr) | {r['lolf']} | {seq.lolf_occ_yr:.3f} | "
        f"{(seq.lolf_occ_yr - r['lolf']) / r['lolf'] * 100:+.2f}% |",
        f"| PLC | {r['plc']:.4e} | {seq.plc:.4e} | — |",
        f"| EDNS (MW) | {r['edns']} | {seq.edns_mw:.4f} | — |",
        f"| years to converge | {r['years']} | {seq.years} | — |",
        f"| wall clock | n/a | {t_seq:.1f} s (single chip) | — |",
        "", "Top nodal EENS (MWh/yr):", "",
        "| Bus | Reference | Ours |", "|---|---|---|",
    ]
    for bus, val in r["nodal_top"].items():
        lines.append(f"| {bus} | {val} | "
                     f"{seq.nodal_eens_mwh_yr[bus - 1]:.1f} |")
    lines += ["", "Critical components P(down | loss hour):", "",
              "| Component | Reference | Ours |", "|---|---|---|"]
    for comp, val in r["comp_top"].items():
        lines.append(f"| {comp} | {val} | "
                     f"{seq.comp_importance[comp - 1]:.3f} |")

    print(f"SEQ done in {t_seq:.1f}s: EENS {seq.eens_mwh_yr:.2f} "
          f"LOLE {seq.lole_hr_yr:.3f} LOLF {seq.lolf_occ_yr:.3f} "
          f"years {seq.years} overflow {seq.overflow_hours}")

    lines += ["", "MC-noise note: both runs are independent Monte Carlo "
              "estimates; agreement is expected within the runs' CoV "
              "(NSQ beta ~1.5%, SEQ CoV 5%)."]
    with open("PARITY_TABLES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote PARITY_TABLES.md (PARITY.md holds the curated analysis)")


if __name__ == "__main__":
    main()
