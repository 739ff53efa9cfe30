"""TPU-native bulk power-system reliability assessment framework.

A brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of the
MATLAB+Julia reference suite ``Matrixeigs/PowerSystemsReliabilityAssessment``:

* HL1 generation adequacy ("copper sheet"): non-sequential and sequential
  Monte Carlo, analytical COPT convolution (probability and
  frequency-and-duration variants), load-forecast uncertainty, maintenance
  scheduling, energy-limited units, multi-area adequacy with tie-line
  constraints, tail-risk (VaR/CVaR) analysis.
* HL2 composite generation+transmission adequacy: non-sequential state
  sampling and sequential chronological Monte Carlo with a batched DC-OPF
  minimum-load-shedding evaluator (replacing MATPOWER/MIPS per-state solves),
  nodal indices and weak-point detection.

Design: scenarios are a sharded batch axis over a ``jax.sharding.Mesh``;
state sampling is vectorized counter-based PRNG; state evaluation is a
vmapped fixed-iteration primal-dual interior-point LP in B-theta form
(islanding-safe); index accumulation is ``psum`` over ICI with
coefficient-of-variation convergence control on host.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to bfloat16 accumulation inputs, which silently
# truncates integers like 265 -> 264 in one-hot scatters and adds ~0.4%
# error to PTDF flow checks and IPM residuals. Reliability indices need
# exact bookkeeping: force full float32 matmul precision framework-wide
# (the hot path's cost lives in the Pallas kernels, not the MXU matmuls,
# so the throughput impact is small — measured in bench.py).
_jax.config.update("jax_default_matmul_precision", "highest")

from powersystemsreliabilityassessment_tpu.utils.config import (  # noqa: F401
    CompatFlags,
    MCSConfig,
)
