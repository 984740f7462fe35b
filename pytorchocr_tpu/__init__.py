"""pytorchocr_tpu — a TPU-native OCR framework (JAX / XLA / Pallas / pjit).

A ground-up rebuild of the capabilities of DYJNG/PyTorchOCR (PaddleOCR-style
config-driven OCR toolkit) designed for TPU hardware:

  * functional flax.linen models, NHWC layouts, bf16 compute / f32 params
  * one jitted graph per task; static shapes via resize buckets
  * data parallelism (and beyond) via jax.sharding.Mesh + jit — cross-replica
    BatchNorm is automatic under global-view jit semantics
  * detection postprocess front-half on device; host geometry in numpy/cv2
  * orbax checkpointing, YAML config semantics compatible with the reference

Reference layer map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
