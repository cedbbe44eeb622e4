"""murb-tpu: a TPU-native (JAX/XLA/Pallas) N-body simulation framework.

A from-scratch rebuild of the capabilities of the MUrB C++/CUDA/MPI reference
(albtad01/NBody-EuroHPC): an all-pairs softened-gravity engine over an SoA body
state with galaxy / random / two-galaxy initial conditions, explicit-Euler and
leapfrog integrators, a registry of interchangeable implementations, conserved
quantity tracking with CSV export, FPS / GFlop/s performance reporting (with the
reference's exact 20*N^2 FLOPs model), differential validation against a naive
oracle, and distributed scaling over a `jax.sharding.Mesh`.

Layer map (TPU-native analogue of reference SURVEY.md section 1):
  - ``murb_tpu.core``     -- body state pytree, initializers, integrators,
                             history/metrics (ref: src/common/core/)
  - ``murb_tpu.ops``      -- compute kernels: XLA oracle + Pallas tile + MXU
                             (ref: src/murb/implem/ hot loops)
  - ``murb_tpu.models``   -- engine registry behind one interface
                             (ref: SimulationNBodyInterface + factory)
  - ``murb_tpu.parallel`` -- mesh/sharding engines: all_gather + ppermute ring
                             (ref: SimulationNBodyMultiNode MPI engine)
  - ``murb_tpu.utils``    -- CLI args, Perf timers (ref: src/common/utils/)
  - ``murb_tpu.visu``     -- headless + offline renderers (ref: src/common/ogl/)
"""

__version__ = "0.1.0"

# Physical constants -- ref: src/common/core/SimulationNBodyInterface.hpp:18
G = 6.67384e-11

# Defaults -- ref: src/murb/main.cpp:45-47
DEFAULT_DT = 3600.0
DEFAULT_SOFTENING = 2.0e8

from murb_tpu.core.state import BodyState  # noqa: E402,F401
from murb_tpu.models import create_engine, available_implementations  # noqa: E402,F401
