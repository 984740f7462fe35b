"""Neck registry (reference pytocr/modeling/necks/__init__.py:3-14)."""

import copy
import importlib

from ..registry import instantiate

__all__ = ["build_neck", "neck_out_channels"]

_NECKS = {
    "FPN": ("pytorchocr_tpu.modeling.necks.fpn", "FPN"),
    "FPEM_FFM": ("pytorchocr_tpu.modeling.necks.fpem_ffm", "FPEM_FFM"),
    "SequenceEncoder": ("pytorchocr_tpu.modeling.necks.rnn", "SequenceEncoder"),
    "CSPPAN": ("pytorchocr_tpu.modeling.necks.csp_pan", "CSPPAN"),
}


def build_neck(config, dtype=None):
    config = copy.deepcopy(config)
    module_name = config.pop("name")
    assert module_name in _NECKS, Exception(
        "neck only support {}".format(list(_NECKS))
    )
    mod_path, attr = _NECKS[module_name]
    module_class = getattr(importlib.import_module(mod_path), attr)
    extra = {} if dtype is None else {"dtype": dtype}
    return instantiate(module_class, config, **extra)


def neck_out_channels(neck):
    """Output channel count of a constructed neck module."""
    if hasattr(neck, "fused_channels"):
        return neck.fused_channels
    return neck.out_channels
