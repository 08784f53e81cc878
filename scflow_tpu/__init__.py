"""scflow_tpu: a TPU-native JAX/XLA/Pallas framework for shape-constraint
recurrent-flow 6D object pose refinement (SCFlow-class capabilities).

Re-designed TPU-first from the capabilities of the SCFlow reference
(CVPR 2023): functional core, static shapes, `lax.scan` recurrences,
dense (vmapped) geometry instead of per-image Python loops, on-device
rendering, and data-parallel scaling via `jax.sharding.Mesh` + jit.
"""

from scflow_tpu.version import __version__

__all__ = ["__version__"]
