"""BaseModel: Transform -> Backbone -> Neck -> Head composition
(reference pytocr/modeling/architectures/base_model.py:11-73).

A flax module whose submodules are constructed by `build_base_model` with
the reference's channel-inference chain.  `return_all_feats` exposes
backbone/neck/head outputs for distillation.
"""

import copy
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..backbones import build_backbone
from ..heads import build_head
from ..necks import build_neck, neck_out_channels
from ..transforms import build_transform

__all__ = ["BaseModel", "build_base_model"]


class BaseModel(nn.Module):
    backbone: nn.Module
    head: nn.Module
    transform: Optional[nn.Module] = None
    neck: Optional[nn.Module] = None
    return_all_feats: bool = False

    def __call__(self, x, data=None, train: bool = False):
        y = {}
        if self.transform is not None:
            x = self.transform(x, train=train)
        x = self.backbone(x, train=train)
        y["backbone_out"] = x
        if self.neck is not None:
            x = self.neck(x, train=train)
        y["neck_out"] = x
        x = self.head(x, targets=data, train=train)
        if isinstance(x, dict):
            y.update(x)
        else:
            y["head_out"] = x
        if self.return_all_feats:
            return y
        return x


def build_base_model(config, dtype=jnp.float32):
    """Construct a BaseModel from an Architecture config section."""
    config = copy.deepcopy(config)
    in_channels = config.get("in_channels", 3)
    model_type = config["model_type"]

    transform = None
    if config.get("Transform"):
        tcfg = dict(config["Transform"])
        tcfg["in_channels"] = in_channels
        transform = build_transform(tcfg, dtype=dtype)
        in_channels = transform.out_channels

    bcfg = dict(config["Backbone"])
    bcfg["in_channels"] = in_channels
    backbone = build_backbone(bcfg, model_type, dtype=dtype)
    in_channels = backbone.out_channels

    neck = None
    if config.get("Neck"):
        ncfg = dict(config["Neck"])
        ncfg["in_channels"] = in_channels
        neck = build_neck(ncfg, dtype=dtype)
        in_channels = neck_out_channels(neck)

    hcfg = dict(config["Head"])
    hcfg["in_channels"] = in_channels
    head = build_head(hcfg, dtype=dtype)

    return BaseModel(
        backbone=backbone,
        head=head,
        transform=transform,
        neck=neck,
        return_all_feats=config.get("return_all_feats", False),
    )
