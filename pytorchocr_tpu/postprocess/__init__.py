"""Postprocess registry (reference pytocr/postprocess/__init__.py:13-30)."""

import copy

__all__ = ["build_post_process"]


def build_post_process(config, global_config=None):
    from .db_postprocess import DBPostProcess, DistillationDBPostProcess
    from .pse_postprocess import PSEPostProcess
    from .pan_postprocess import PANPostProcess
    from .rec_postprocess import (
        AttnLabelDecode,
        CTCLabelDecode,
        DistillationCTCLabelDecode,
    )
    from .cls_postprocess import ClsPostProcess
    from .table_postprocess import TableLabelDecode

    support_dict = {
        "DBPostProcess": DBPostProcess,
        "PSEPostProcess": PSEPostProcess,
        "PANPostProcess": PANPostProcess,
        "CTCLabelDecode": CTCLabelDecode,
        "AttnLabelDecode": AttnLabelDecode,
        "ClsPostProcess": ClsPostProcess,
        "DistillationCTCLabelDecode": DistillationCTCLabelDecode,
        "DistillationDBPostProcess": DistillationDBPostProcess,
        "TableLabelDecode": TableLabelDecode,
    }

    config = copy.deepcopy(config)
    module_name = config.pop("name")
    if module_name == "None":
        return None
    if global_config is not None:
        config.update(global_config)
    assert module_name in support_dict, Exception(
        "post process only support {}".format(list(support_dict))
    )
    return support_dict[module_name](**config)
