"""equiformer_tpu: a TPU-native equivariant graph attention transformer framework.

JAX / XLA / Pallas re-design of the capabilities of the reference PyTorch
Equiformer (ICLR 2023 + DeNS), built for static shapes, segment reductions and
data-parallel training over TPU device meshes.
"""

__version__ = "0.1.0"

from . import core
