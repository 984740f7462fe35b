"""Head registry (reference pytocr/modeling/heads/__init__.py:3-27)."""

import copy
import importlib

from ..registry import instantiate

__all__ = ["build_head"]

_HEADS = {
    "DBHead": ("pytorchocr_tpu.modeling.heads.det_db_head", "DBHead"),
    "PSEHead": ("pytorchocr_tpu.modeling.heads.det_pse_head", "PSEHead"),
    "PANHead": ("pytorchocr_tpu.modeling.heads.det_pan_head", "PANHead"),
    "CTCHead": ("pytorchocr_tpu.modeling.heads.rec_ctc_head", "CTCHead"),
    "ClsHead": ("pytorchocr_tpu.modeling.heads.cls_head", "ClsHead"),
    "SLAHead": ("pytorchocr_tpu.modeling.heads.table_att_head", "SLAHead"),
}


def build_head(config, dtype=None):
    config = copy.deepcopy(config)
    module_name = config.pop("name")
    assert module_name in _HEADS, Exception(
        "head only support {}".format(list(_HEADS))
    )
    mod_path, attr = _HEADS[module_name]
    module_class = getattr(importlib.import_module(mod_path), attr)
    extra = {} if dtype is None else {"dtype": dtype}
    return instantiate(module_class, config, **extra)
