"""Pallas TPU kernels for ops XLA doesn't fuse well.

Currently: fused InstanceNorm (stats + normalize in one VMEM-resident pass
per sample). Kernels run in interpret mode on CPU so the whole test suite
exercises them without TPU hardware.
"""

from .instance_norm import instance_norm

__all__ = ["instance_norm"]
