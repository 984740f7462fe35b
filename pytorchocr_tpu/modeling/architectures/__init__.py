"""Architecture registry (reference pytocr/modeling/architectures/__init__.py:9-19)."""

import copy

import jax.numpy as jnp

from .base_model import BaseModel, build_base_model
from .distillation_model import DistillationModel, build_distillation_model

__all__ = ["build_model", "BaseModel", "DistillationModel"]


def build_model(config, dtype=jnp.float32):
    config = copy.deepcopy(config)
    if "name" not in config:
        return build_base_model(config, dtype=dtype)
    support_dict = ["DistillationModel"]
    name = config.pop("name")
    assert name in support_dict, Exception(
        "architecture only support {}".format(support_dict)
    )
    return build_distillation_model(config, dtype=dtype)
