"""Backbone registry (reference pytocr/modeling/backbones/__init__.py:3-29).

Backbones are imported lazily by name so each family can be developed and
loaded independently.
"""

import copy
import importlib

from ..registry import instantiate

__all__ = ["build_backbone"]

_DET_TABLE = {
    "ResNet": ("pytorchocr_tpu.modeling.backbones.det_resnet", "ResNet"),
    "MobileNetV3": ("pytorchocr_tpu.modeling.backbones.det_mobilenet_v3", "MobileNetV3"),
    "ShuffleNetV2": ("pytorchocr_tpu.modeling.backbones.det_shufflenet_v2", "ShuffleNetV2"),
    "RepVGG": ("pytorchocr_tpu.modeling.backbones.det_repvgg", "RepVGG"),
    "ConvNeXt": ("pytorchocr_tpu.modeling.backbones.det_convnext", "ConvNeXt"),
    "SwinTransformer": ("pytorchocr_tpu.modeling.backbones.det_swin", "SwinTransformer"),
    "PPLCNet": ("pytorchocr_tpu.modeling.backbones.det_pplcnet", "PPLCNet"),
}
_REC_CLS = {
    "VGG": ("pytorchocr_tpu.modeling.backbones.rec_vgg", "VGG"),
    "ResNet": ("pytorchocr_tpu.modeling.backbones.rec_resnet", "ResNet"),
    "MobileNetV3": ("pytorchocr_tpu.modeling.backbones.rec_mobilenet_v3", "MobileNetV3"),
}


def build_backbone(config, model_type, dtype=None):
    config = copy.deepcopy(config)
    if model_type in ("det", "table"):
        support_dict = _DET_TABLE
    elif model_type in ("rec", "cls"):
        support_dict = _REC_CLS
    else:
        raise NotImplementedError(model_type)

    module_name = config.pop("name")
    assert module_name in support_dict, Exception(
        "when model type is {}, backbone only support {}".format(
            model_type, list(support_dict)
        )
    )
    mod_path, attr = support_dict[module_name]
    module_class = getattr(importlib.import_module(mod_path), attr)
    extra = {} if dtype is None else {"dtype": dtype}
    return instantiate(module_class, config, **extra)
