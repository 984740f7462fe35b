"""Loss registry (reference pytocr/losses/__init__.py:30-40).

Losses are plain callables (preds, batch) -> {"loss": scalar, ...} of jnp
values, usable directly inside the jitted train step.
"""

import copy

from .basic_loss import DistanceLoss  # noqa: F401
from .cls_loss import ClsLoss
from .combined_loss import CombinedLoss
from .det_db_loss import DBLoss
from .det_pan_loss import PANLoss
from .det_pse_loss import PSELoss
from .rec_ctc_loss import CTCLoss
from .table_att_loss import SLALoss

__all__ = ["build_loss"]

_SUPPORTED = {
    "DBLoss": DBLoss,
    "PSELoss": PSELoss,
    "PANLoss": PANLoss,
    "CTCLoss": CTCLoss,
    "ClsLoss": ClsLoss,
    "CombinedLoss": CombinedLoss,
    "SLALoss": SLALoss,
}


def build_loss(config):
    config = copy.deepcopy(config)
    module_name = config.pop("name")
    assert module_name in _SUPPORTED, Exception(
        "loss only support {}".format(list(_SUPPORTED))
    )
    return _SUPPORTED[module_name](**config)
