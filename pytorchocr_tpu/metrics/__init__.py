"""Metric registry (reference pytocr/metrics/__init__.py)."""

import copy

from .cls_metric import ClsMetric
from .det_metric import DetMetric
from .distillation_metric import DistillationMetric
from .rec_metric import RecMetric
from .table_metric import TableMetric, TableStructureMetric  # noqa: F401

__all__ = ["build_metric"]

_SUPPORTED = {
    "DetMetric": DetMetric,
    "RecMetric": RecMetric,
    "ClsMetric": ClsMetric,
    "DistillationMetric": DistillationMetric,
    "TableMetric": TableMetric,
}


def build_metric(config):
    config = copy.deepcopy(config)
    module_name = config.pop("name")
    assert module_name in _SUPPORTED, Exception(
        "metric only support {}".format(list(_SUPPORTED))
    )
    return _SUPPORTED[module_name](**config)
