"""Batched DC-OPF minimum-load-shedding evaluator (HL2 state evaluation).

Replaces the reference's per-state ``runopf`` calls (MATPOWER MIPS DC-OPF
with dispatchable-load "virtual generators": ``mc_simulation.m:32-99``,
``seq_mcsimulation.m:432-507``, load transform ``dispaload.m:30-87``) with a
single batched LP in **B-theta form**:

    variables  x = [Pg (ng), shed (nd), f (nl), theta (nb)]
    minimize   sum(shed)
    s.t.       Cg Pg + Cd shed - Minc' f = bus_load          (nb rows)
               (1/b_l) f_l - status_l (theta_i - theta_j) = 0 (nl rows)
               0 <= Pg <= Pmax * status,  0 <= shed <= load,
               |f| <= rate,  |theta| <= theta_max

Why B-theta instead of the PTDF form: branch outages and island formation
change the PTDF but only *mask rows* here — every outage pattern (including
network splits, which single-line outages can cause on RTS-24: line 7-8
islands bus 7) compiles to the same static-shape LP, and per-island power
balance emerges from the node equations themselves. The angle translation
null-space of islands is absorbed by the solver's diagonal regularization
and the symmetric theta box.

DNS equals the LP objective (in MW: objective * base_mva), matching the
reference identity DNS = Result.f + total_load (mc_simulation.m:54).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from powersystemsreliabilityassessment_tpu.core.system import System
from powersystemsreliabilityassessment_tpu.engines import lp_ipm
from powersystemsreliabilityassessment_tpu.utils.config import CompatFlags, IPMConfig


class EvalResult(NamedTuple):
    dns_mw: jax.Array        # [B] total demand not supplied, MW
    nodal_mw: jax.Array      # [B, nb] per-bus shed, MW
    failure: jax.Array       # [B] bool: dns above the failure-flag threshold
    primal_residual: jax.Array  # [B] LP feasibility diagnostics
    gen_dispatch: jax.Array  # [B, ng] p.u. (diagnostics / tests)


def _lp_dims(sys: System) -> tuple[int, int]:
    n = sys.n_gen + sys.n_load + sys.n_branch + sys.n_bus
    m = sys.n_bus + sys.n_branch
    return n, m


def build_state_lp(sys: System, gen_up: jax.Array, br_up: jax.Array,
                   load_pu: jax.Array, compat: CompatFlags,
                   theta_max: float):
    """Assemble (c, A, b, l, u) for one system state.

    ``gen_up`` [ng], ``br_up`` [nl] are 1.0 when the component is in
    service; ``load_pu`` [nd] is the per-load-bus demand for this state's
    hour (peak * hourly factor).
    """
    ng, nd, nl, nb = sys.n_gen, sys.n_load, sys.n_branch, sys.n_bus
    dt = sys.bus_pd.dtype

    c = jnp.concatenate([
        jnp.zeros((ng,), dt), jnp.ones((nd,), dt),
        jnp.zeros((nl,), dt), jnp.zeros((nb,), dt),
    ])

    # Out-of-service (and zero-capacity, e.g. synchronous-condenser) units
    # are handled by ZEROING their balance-equation column rather than
    # shrinking their box to width ~0: degenerate boxes wreck the interior
    # point's complementarity scaling in float32, while a zero column simply
    # disconnects the variable (exactly MATPOWER's removed-unit semantics,
    # and it keeps the LP bounds constant across scenarios).
    has_cap = (sys.gen_pmax > 0).astype(dt)
    gen_col = gen_up * has_cap

    # Balance block [nb, n]: Cg Pg + Cd s - Minc' f = bus_load
    bal = jnp.concatenate([
        sys.gen_bus_onehot * gen_col[None, :], sys.load_onehot,
        -sys.incidence.T, jnp.zeros((nb, nb), dt),
    ], axis=1)
    # Flow block [nl, n]: (1/b) f - status * Minc theta = 0
    flow = jnp.concatenate([
        jnp.zeros((nl, ng + nd), dt),
        jnp.diag(1.0 / sys.b_susceptance),
        -br_up[:, None] * sys.incidence,
    ], axis=1)
    A = jnp.concatenate([bal, flow], axis=0)

    b = jnp.concatenate([sys.load_onehot @ load_pu, jnp.zeros((nl,), dt)])

    eps = jnp.asarray(1e-6, dt)
    pmin = sys.gen_pmin if compat.enforce_pmin else jnp.zeros((ng,), dt)
    pmax = jnp.maximum(sys.gen_pmax, pmin + eps)
    pmax = jnp.where(sys.gen_pmax > 0, pmax, 1.0)  # zero-cap: dummy box
    l = jnp.concatenate([
        pmin, jnp.zeros((nd,), dt), -sys.br_rate,
        jnp.full((nb,), -theta_max, dt),
    ])
    u = jnp.concatenate([
        pmax, jnp.maximum(load_pu, eps), sys.br_rate,
        jnp.full((nb,), theta_max, dt),
    ])
    return c, A, b, l, u


def _solve_one(sys: System, comp_down: jax.Array, load_pu: jax.Array,
               compat: CompatFlags, ipm: IPMConfig):
    ng, nd, nl = sys.n_gen, sys.n_load, sys.n_branch
    up = 1.0 - comp_down.astype(sys.bus_pd.dtype)
    gen_up, br_up = up[:ng], up[ng:ng + nl]
    c, A, b, l, u = build_state_lp(sys, gen_up, br_up, load_pu, compat,
                                   ipm.theta_max)
    sol = lp_ipm.solve_box_lp(c, A, b, l, u, ipm)
    shed = sol.x[ng:ng + nd]
    return shed, sol.x[:ng], sol.primal_residual


@partial(jax.jit, static_argnames=("compat", "ipm"))
def evaluate_states(sys: System, comp_down: jax.Array, load_pu: jax.Array,
                    compat: CompatFlags = CompatFlags(),
                    ipm: IPMConfig = IPMConfig()) -> EvalResult:
    """Evaluate a batch of system states with the DC-OPF LP.

    Args:
      comp_down: [B, n_comp] component failure indicator (1 = failed, the
        reference convention).
      load_pu:   [B, n_load] per-load-bus demand in p.u. for each state.

    Returns MW quantities with the reference's noise thresholds applied
    (mc_simulation.m:57-59, :86).
    """
    shed, pg, res = jax.vmap(
        lambda s, d: _solve_one(sys, s, d, compat, ipm))(comp_down, load_pu)

    base = sys.base_mva
    dns = jnp.sum(shed, axis=1) * base
    nodal = (shed * base) @ sys.load_onehot.T  # [B, nb]

    dns = jnp.where(dns < compat.dns_noise_floor_mw, 0.0, dns)
    nodal = jnp.where(
        (nodal > compat.nodal_noise_threshold_mw)
        & (dns[:, None] > 0), nodal, 0.0)
    failure = dns > compat.nsq_fail_flag_threshold_mw
    return EvalResult(dns_mw=dns, nodal_mw=nodal, failure=failure,
                      primal_residual=res, gen_dispatch=pg)


def copper_sheet_bound(sys: System, comp_down: jax.Array,
                       load_pu: jax.Array) -> jax.Array:
    """Lower bound on DNS (MW): generation-capacity deficit ignoring the
    network. Used for screening and as a sanity invariant in tests
    (LP shed >= copper-sheet shed always)."""
    up = 1.0 - comp_down[..., : sys.n_gen].astype(sys.gen_pmax.dtype)
    cap = up @ sys.gen_pmax
    load = jnp.sum(load_pu, axis=-1)
    return jnp.maximum(load - cap, 0.0) * sys.base_mva
