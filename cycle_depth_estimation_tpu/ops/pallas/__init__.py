"""Pallas TPU kernels for ops XLA doesn't fuse well.

- ``instance_norm``: fused InstanceNorm (stats + normalize in one
  VMEM-resident pass per sample).
- ``fused_in_epilogue``: int8-serving conv epilogue (dequant-scaled
  InstanceNorm + ReLU/residual + requant in one pass). Measured SLOWER than
  XLA's own conv-epilogue fusion on v5e (12.46 vs 10.07 ms/block — see
  int8_epilogue.py), so models/quantization.py defaults to the XLA path;
  the kernel is kept as the measured alternative.

Kernels run in interpret mode on CPU so the whole test suite exercises
them without TPU hardware.
"""

from .instance_norm import instance_norm
from .int8_epilogue import fused_in_epilogue

__all__ = ["instance_norm", "fused_in_epilogue"]
