"""cycle_depth_estimation_tpu — a TPU-native JAX framework.

A ground-up rebuild of the capabilities of JosephineRabbit/cycle_depth_estimation
(a CycleGAN-lineage research stack for unpaired image translation and
synthetic→real domain-adapted joint semantic-segmentation + monocular-depth
estimation) designed TPU-first:

- NHWC layouts, bfloat16 compute on the MXU, fp32 params.
- Torch-compatible conv/padding semantics (see `ops/`) so reference ``.pth``
  checkpoints import with ~1e-5 numerical parity.
- One jit-compiled train step per model performing *all* sub-updates
  (generators, discriminators, task heads, ImagePool replay) in a single
  compiled program — `jax.lax.stop_gradient` replaces detach/requires_grad.
- Data parallelism via `jax.sharding.Mesh` + NamedSharding; XLA inserts the
  gradient all-reduce collectives over ICI.

Reference layer map: SURVEY.md §1 (options → data → model-orchestration →
network layers of /root/reference).
"""

__version__ = "0.1.0"
