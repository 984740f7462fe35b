"""DistillationModel: named dict of BaseModels (Teacher/Student/...)
(reference pytocr/modeling/architectures/distillation_model.py:13-45).

Freezing (`freeze_params`) is handled functionally: the trainer consults
`frozen_names` to stop-gradient those submodels' params; `pretrained` paths
are loaded by the checkpoint layer at init time.
"""

import copy
from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .base_model import build_base_model

__all__ = ["DistillationModel", "build_distillation_model"]


class DistillationModel(nn.Module):
    model_names: Tuple[str, ...]
    models: Tuple[nn.Module, ...]
    frozen_names: Tuple[str, ...] = ()

    def __call__(self, x, data=None, train: bool = False):
        import jax

        result_dict = {}
        for name, model in zip(self.model_names, self.models):
            # frozen (teacher) submodels run in eval-mode BN semantics and
            # contribute no gradients (functional equivalent of
            # requires_grad=False + model.training=False in the reference)
            frozen = name in self.frozen_names
            out = model(x, data=data, train=train and not frozen)
            if frozen:
                out = jax.lax.stop_gradient(out)
            result_dict[name] = out
        return result_dict


def build_distillation_model(config, dtype=jnp.float32):
    config = copy.deepcopy(config)
    names, models, frozen = [], [], []
    pretrained = {}
    for key in config["Models"]:
        model_config = copy.deepcopy(config["Models"][key])
        if model_config.pop("freeze_params", False):
            frozen.append(key)
        p = model_config.pop("pretrained", None)
        if p:
            pretrained[key] = p
        models.append(build_base_model(model_config, dtype=dtype))
        names.append(key)
    # `pretrained` submodel paths are applied by the trainer (utils.save_load
    # reads them straight from the config), since flax modules are frozen.
    return DistillationModel(
        model_names=tuple(names), models=tuple(models), frozen_names=tuple(frozen)
    )
