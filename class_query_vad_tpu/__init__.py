"""class_query_vad_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
video action detection with class-specific attention (Class-Query VAD).

Re-designed from scratch for TPU hardware with the same capabilities as the
reference PyTorch/CUDA stack (dlrudco/class-query-vad):

  * ``ops``       — Pallas/XLA kernels: 3D multi-scale deformable attention,
                    Mamba selective scan, on-device Hungarian assignment.
  * ``models``    — DETR-family detector: 3D backbones (ViT-B, CSN, VideoMamba),
                    multi-scale encoder (deformable / SSM / VSS), DAB-style
                    decoder with the class-query classification branch.
  * ``datasets``  — AVA / UCF101-24 / JHMDB51-21 clip pipelines.
  * ``evaluates`` — frame-mAP (PASCAL) and video-mAP (tube linking) metrics.
  * ``parallel``  — jax.sharding mesh / pjit data-parallel train + eval steps.
  * ``utils``     — box ops, padded-clip batching, checkpointing, logging.
"""

__version__ = "0.1.0"
