"""TPU-native op/layer library.

Layout convention: **NHWC** everywhere (TPU-friendly; channels on the 128-lane
minor dimension). Params are fp32; compute dtype is configurable (bfloat16 for
TPU throughput, fp32 for checkpoint-parity runs).

The primitives reproduce the exact padding/stride semantics of the reference's
torch layers (reference models/networks.py) so that imported ``.pth``
checkpoints are numerically equivalent.
"""

from .layers import (
    Conv,
    ConvTranspose,
    InstanceNorm,
    Norm,
    reflect_pad,
    replicate_pad,
    avg_pool,
    max_pool,
    pixel_shuffle,
    resize_bilinear,
    resize_nearest,
)
from .init import make_initializer

__all__ = [
    "Conv",
    "ConvTranspose",
    "InstanceNorm",
    "Norm",
    "reflect_pad",
    "replicate_pad",
    "avg_pool",
    "max_pool",
    "pixel_shuffle",
    "resize_bilinear",
    "resize_nearest",
    "make_initializer",
]
