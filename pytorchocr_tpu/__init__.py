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


def build_model(config, **kwargs):
    from pytorchocr_tpu.modeling import build_model as _f

    return _f(config, **kwargs)


def build_loss(config):
    from pytorchocr_tpu.losses import build_loss as _f

    return _f(config)


def build_optimizer(config, epochs, step_each_epoch, **kwargs):
    from pytorchocr_tpu.optimizer import build_optimizer as _f

    return _f(config, epochs, step_each_epoch, **kwargs)


def build_post_process(config, global_config=None):
    from pytorchocr_tpu.postprocess import build_post_process as _f

    return _f(config, global_config)


def build_metric(config):
    from pytorchocr_tpu.metrics import build_metric as _f

    return _f(config)


def build_dataloader(config, mode, logger, seed=None):
    from pytorchocr_tpu.data import build_dataloader as _f

    return _f(config, mode, logger, seed)
