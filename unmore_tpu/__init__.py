"""unmore_tpu: a TPU-native (JAX/XLA/Pallas) framework for unsupervised
multi-object segmentation via center-boundary reasoning.

Re-designed from scratch with the capabilities of vLAR-group/unMORE
(ICML 2025, arXiv 2506.01778). Three stages:

1. ``unmore_tpu.train`` — learn objectness priors (ObjectnessNet center
   field + boundary distance field; ResNet-50 existence classifier) on
   ImageNet crops with VoteCut pseudo-masks, under ``jit`` on a
   data-parallel ``jax.sharding.Mesh``.
2. ``unmore_tpu.reasoning`` — training-free multi-object discovery on
   full images: existence checking, center-singularity splitting,
   iterative boundary-driven box evolution, scoring — all as
   fixed-shape, batched XLA programs (``lax.scan`` over rounds) instead
   of the reference's per-image Python loops.
3. ``unmore_tpu.detector`` — self-train a class-agnostic Cascade Mask
   R-CNN on the discovered pseudo-labels.

Public CLI entry points and JSON contracts match the reference
(``train_objectness_net.py``, ``object_reasoning.py``,
``object_scoring.py``, ``post_process.py``,
``merge_coco_and_imagenet.py``, ``COCO_evaluator``) so artifacts
interoperate.
"""

__version__ = "0.1.0"
