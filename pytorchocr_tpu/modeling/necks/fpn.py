"""FPN neck (reference pytocr/modeling/necks/fpn.py:8-134).

1x1 laterals + top-down nearest-upsample-add + 3x3 smoothing; mode="DB"
concatenates four out_channels/4 maps back to out_channels; otherwise four
out_channels maps concat to 4*out_channels.  Optional ASF attention (DB++).
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBNAct, resize_nearest
from .asf import ScaleFeatureSelection

__all__ = ["FPN"]


class FPN(nn.Module):
    in_channels: Sequence[int]
    out_channels: int = 256
    mode: str = None
    use_asf: bool = False
    attention_type: str = "scale_spatial"
    dtype: Any = jnp.float32

    @property
    def fused_channels(self):
        return self.out_channels if self.mode == "DB" else self.out_channels * 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2, c3, c4, c5 = x
        oc = self.out_channels

        in5 = ConvBNAct(oc, 1, 1, act="relu", dtype=self.dtype, name="in5")(c5, train)
        in4 = ConvBNAct(oc, 1, 1, act="relu", dtype=self.dtype, name="in4")(c4, train)
        in3 = ConvBNAct(oc, 1, 1, act="relu", dtype=self.dtype, name="in3")(c3, train)
        in2 = ConvBNAct(oc, 1, 1, act="relu", dtype=self.dtype, name="in2")(c2, train)

        out4 = resize_nearest(in5, 2) + in4
        out3 = resize_nearest(out4, 2) + in3
        out2 = resize_nearest(out3, 2) + in2

        sc = oc // 4 if self.mode == "DB" else oc
        p5 = ConvBNAct(sc, 3, 1, act="relu", dtype=self.dtype, name="out5")(in5, train)
        p4 = ConvBNAct(sc, 3, 1, act="relu", dtype=self.dtype, name="out4")(out4, train)
        p3 = ConvBNAct(sc, 3, 1, act="relu", dtype=self.dtype, name="out3")(out3, train)
        p2 = ConvBNAct(sc, 3, 1, act="relu", dtype=self.dtype, name="out2")(out2, train)

        p5 = resize_nearest(p5, 8)
        p4 = resize_nearest(p4, 4)
        p3 = resize_nearest(p3, 2)

        if self.mode == "DB":
            feats = [p5, p4, p3, p2]
        else:
            feats = [p2, p3, p4, p5]
        fuse = jnp.concatenate(feats, axis=-1)
        if self.use_asf:
            fuse = ScaleFeatureSelection(
                self.fused_channels,
                sc,
                attention_type=self.attention_type,
                dtype=self.dtype,
                name="concat_attention",
            )(fuse, feats, train)
        return fuse
