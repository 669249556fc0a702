"""acmil_tpu — a TPU-native whole-slide-image classification framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of dazhangyu123/ACMIL
(reference layer map in /root/repo/SURVEY.md): the Step1-Step4 pathology
pipeline (WSI tiling, patch-encoder feature extraction, MIL-head training,
attention heatmaps) plus the full MIL aggregator zoo, redesigned TPU-first:

- padded, length-bucketed feature bags (static shapes for XLA),
- flax models with masked softmax / fixed-shape top-k formulations,
- fused Pallas attention-pooling kernels for the hot ops,
- data-parallel training over a ``jax.sharding.Mesh``,
- C++ slide-IO runtime (``csrc/slideio.cpp``) replacing the reference's
  native decoders.
"""

__version__ = "0.1.0"
