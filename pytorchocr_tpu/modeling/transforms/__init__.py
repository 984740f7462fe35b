"""Transform registry (reference pytocr/modeling/transforms/__init__.py)."""

import copy
import importlib

from ..registry import instantiate

__all__ = ["build_transform"]

_TRANSFORMS = {
    "TPS": ("pytorchocr_tpu.modeling.transforms.tps", "TPS"),
}


def build_transform(config, dtype=None):
    config = copy.deepcopy(config)
    module_name = config.pop("name")
    assert module_name in _TRANSFORMS, Exception(
        "transform only support {}".format(list(_TRANSFORMS))
    )
    mod_path, attr = _TRANSFORMS[module_name]
    module_class = getattr(importlib.import_module(mod_path), attr)
    extra = {} if dtype is None else {"dtype": dtype}
    return instantiate(module_class, config, **extra)
