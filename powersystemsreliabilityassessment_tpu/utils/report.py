"""Reporting & visualization (layer L5): CSV/JSON export matching the
reference schemas plus matplotlib figures mirroring its plots.

* ``nodal_results.csv`` schema: ``BusID,EENS_MWh_yr`` (nsqMain.m:395-400 /
  seqMain.m:252-257);
* NSQ 4-panel convergence figure (beta / EDNS / LOLE / PLC,
  nsqMain.m:410-440) and nodal+weak-point figure (:443-469);
* SEQ 6-panel figure (EENS & CoV convergence, annual-ENS histogram, nodal
  EENS, critical components, seqMain.m:267-314);
* tail-risk histogram / hourly profile / cumulative curves
  (tail_risk.jl:146-204).

Everything here runs on host, out of any jit path.
"""
from __future__ import annotations

import csv
import json
import os

import numpy as np


def export_nodal_csv(path: str, nodal_eens_mwh_yr: np.ndarray) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["BusID", "EENS_MWh_yr"])
        for i, v in enumerate(np.asarray(nodal_eens_mwh_yr), start=1):
            w.writerow([i, float(v)])


def export_json(path: str, result_dict: dict) -> None:
    with open(path, "w") as f:
        json.dump(result_dict, f, indent=2)


def component_label(idx0: int, n_gen: int) -> str:
    """0-based component index -> reference-style 'Gen k'/'Line k' label."""
    return (f"Gen {idx0 + 1}" if idx0 < n_gen
            else f"Line {idx0 - n_gen + 1}")


def top_components(importance: np.ndarray, n_gen: int, k: int = 5):
    order = np.argsort(-importance)[:k]
    return [(component_label(int(i), n_gen), float(importance[i]))
            for i in order]


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_nsq(result, out_path: str, beta_limit: float = 0.0017) -> None:
    plt = _plt()
    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    axes[0, 0].plot(result.beta_history)
    axes[0, 0].axhline(beta_limit, color="r", ls="--")
    axes[0, 0].set_title("Convergence of beta")
    axes[0, 1].plot(result.edns_history, color="g")
    axes[0, 1].set_title("EDNS (MW)")
    axes[1, 0].plot(result.lole_history, color="m")
    axes[1, 0].set_title("LOLE (hr/yr)")
    axes[1, 1].plot(result.plc_history, color="c")
    axes[1, 1].set_title("Prob. Load Curtailment")
    for ax in axes.flat:
        ax.grid(True)
        ax.set_xlabel("batch")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def plot_nodal_and_weakpoints(nodal_eens: np.ndarray,
                              comp_importance: np.ndarray, n_gen: int,
                              out_path: str, top_k: int = 15) -> None:
    plt = _plt()
    fig, (a1, a2) = plt.subplots(1, 2, figsize=(12, 5))
    a1.bar(np.arange(1, len(nodal_eens) + 1), nodal_eens,
           color="#3399cc")
    a1.set_xlabel("Bus ID"); a1.set_ylabel("EENS (MWh/yr)")
    a1.set_title("Nodal Reliability (EENS)"); a1.grid(True)
    if len(comp_importance):
        order = np.argsort(-comp_importance)[:top_k]
        a2.bar(range(len(order)), comp_importance[order] * 100,
               color="#cc4c4c")
        a2.set_xticks(range(len(order)))
        a2.set_xticklabels(
            ["G%d" % (i + 1) if i < n_gen else "L%d" % (i - n_gen + 1)
             for i in order], rotation=45)
        a2.set_ylabel("Probability (%)")
        a2.set_title(f"Top {len(order)} Critical Components")
        a2.grid(True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def plot_seq(result, out_path: str, cov_threshold: float = 0.05,
             n_gen: int = 33) -> None:
    plt = _plt()
    fig, axes = plt.subplots(2, 3, figsize=(14, 7))
    axes[0, 0].plot(result.eens_history, "b-")
    axes[0, 0].set_title("Convergence of EENS (MWh/yr)")
    axes[0, 1].plot(result.cov_history, "r-")
    axes[0, 1].axhline(cov_threshold, color="k", ls="--")
    axes[0, 1].set_title("Convergence of CoV")
    annual = getattr(result, "annual_ens", None) or result.eens_history[-1:]
    axes[0, 2].hist(np.asarray(annual), bins=20, color="0.4")
    axes[0, 2].set_title("Distribution of Annual EENS")
    axes[1, 0].bar(np.arange(1, len(result.nodal_eens_mwh_yr) + 1),
                   result.nodal_eens_mwh_yr, color="#3399cc")
    axes[1, 0].set_title("Nodal Reliability")
    imp = result.comp_importance
    if len(imp):
        order = np.argsort(-imp)[:15]
        ax = axes[1, 1]
        ax.bar(range(len(order)), imp[order] * 100, color="#cc4c4c")
        ax.set_xticks(range(len(order)))
        ax.set_xticklabels(
            ["G%d" % (i + 1) if i < n_gen else "L%d" % (i - n_gen + 1)
             for i in order], rotation=45)
        ax.set_title("Top Critical Components (%)")
    axes[1, 2].axis("off")
    for ax in axes.flat:
        ax.grid(True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def plot_tail_risk(cmp_result, out_path: str) -> None:
    plt = _plt()
    fig, (a1, a2, a3) = plt.subplots(1, 3, figsize=(15, 4.5))
    a1.hist(cmp_result.mc_yearly_distribution, bins=50, density=True,
            alpha=0.6, color="b", label="MC yearly outcomes")
    a1.axvline(cmp_result.analytical_lole, color="r", lw=3,
               label="Analytical prediction")
    a1.axvline(cmp_result.mc_lole, color="b", ls="--", lw=2,
               label="MC average")
    a1.axvline(cmp_result.var95, color="k", ls=":", label="VaR95")
    a1.set_title("Distribution of annual risk (tail risk)")
    a1.set_xlabel("LOLE (h/yr)"); a1.legend()
    peak = int(np.argmax(cmp_result.mc_hourly_profile))
    lo, hi = max(0, peak - 50), peak + 50
    a2.fill_between(range(lo, hi), cmp_result.mc_hourly_profile[lo:hi],
                    alpha=0.3, color="b")
    a2.plot(range(lo, hi), cmp_result.analytical_hourly_profile[lo:hi],
            "r", lw=2)
    a2.set_title("Hourly risk profile (peak window)")
    a3.plot(np.cumsum(cmp_result.mc_hourly_profile), "b", label="MC")
    a3.plot(np.cumsum(cmp_result.analytical_hourly_profile), "r--",
            label="Analytical")
    a3.set_title("Cumulative risk over year"); a3.legend()
    for ax in (a1, a2, a3):
        ax.grid(True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def export_study(result, out_dir: str, prefix: str,
                 make_plots: bool = True, **plot_kw) -> None:
    """CSV + JSON (+ figures) for an NSQ/SEQ result object."""
    os.makedirs(out_dir, exist_ok=True)
    export_nodal_csv(os.path.join(out_dir, f"{prefix}_nodal_results.csv"),
                     result.nodal_eens_mwh_yr)
    export_json(os.path.join(out_dir, f"{prefix}_results.json"),
                result.to_dict())
