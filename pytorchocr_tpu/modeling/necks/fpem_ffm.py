"""PAN neck: cascaded FPEM modules + FFM fusion
(reference pytocr/modeling/necks/fpem_ffm.py:8-197), NHWC flax.
v1 (PAN): use the last FPEM only in v2 mode / sum in v1; v2 (PAN++)
residual-accumulates FPEM outputs."""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBNAct, kaiming_normal, resize_nearest
from .asf import ScaleFeatureSelection

__all__ = ["FPEM_FFM"]


class _DWSmooth(nn.Module):
    """depthwise 3x3 (stride s) -> 1x1 conv + BN + ReLU."""

    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], feature_group_count=self.planes,
            use_bias=False, kernel_init=kaiming_normal, dtype=self.dtype,
            param_dtype=jnp.float32, name="dw",
        )(x)
        return ConvBNAct(self.planes, 1, 1, padding=0, act="relu", dtype=self.dtype,
                         name="smooth")(x, train)


class FPEM(nn.Module):
    planes: int
    mode: str = "v2"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f1, f2, f3, f4 = x
        up = lambda a, b: resize_nearest(a, 2) + b

        f3_ = _DWSmooth(self.planes, 1, dtype=self.dtype, name="l3_1")(up(f4, f3), train)
        f2_ = _DWSmooth(self.planes, 1, dtype=self.dtype, name="l2_1")(up(f3_, f2), train)
        f1_ = _DWSmooth(self.planes, 1, dtype=self.dtype, name="l1_1")(up(f2_, f1), train)

        f2_ = _DWSmooth(self.planes, 2, dtype=self.dtype, name="l2_2")(up(f2_, f1_), train)
        f3_ = _DWSmooth(self.planes, 2, dtype=self.dtype, name="l3_2")(up(f3_, f2_), train)
        f4_ = _DWSmooth(self.planes, 2, dtype=self.dtype, name="l4_2")(up(f4, f3_), train)

        if self.mode == "v2":
            return [f1 + f1_, f2 + f2_, f3 + f3_, f4 + f4_]
        return [f1_, f2_, f3_, f4_]


class FPEM_FFM(nn.Module):
    in_channels: Sequence[int]
    out_channels: int = 128
    mode: str = "v2"
    fpem_num: int = 2
    use_asf: bool = False
    attention_type: str = "scale_spatial"
    dtype: Any = jnp.float32

    @property
    def fused_channels(self):
        return self.out_channels * 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.mode in ["v1", "v2"]
        c2, c3, c4, c5 = x
        oc = self.out_channels
        ins = [
            ConvBNAct(oc, 1, 1, padding=0, act="relu", dtype=self.dtype, name="in2")(c2, train),
            ConvBNAct(oc, 1, 1, padding=0, act="relu", dtype=self.dtype, name="in3")(c3, train),
            ConvBNAct(oc, 1, 1, padding=0, act="relu", dtype=self.dtype, name="in4")(c4, train),
            ConvBNAct(oc, 1, 1, padding=0, act="relu", dtype=self.dtype, name="in5")(c5, train),
        ]
        fpems = []
        for i in range(self.fpem_num):
            ins = FPEM(oc, self.mode, dtype=self.dtype, name="fpem_%d" % (i + 1))(
                ins, train
            )
            fpems.append(ins)

        if self.mode == "v2":
            f1, f2, f3, f4 = fpems[-1]
        else:
            f1, f2, f3, f4 = fpems[0]
            for i in range(1, len(fpems)):
                f1 = f1 + fpems[i][0]
                f2 = f2 + fpems[i][1]
                f3 = f3 + fpems[i][2]
                f4 = f4 + fpems[i][3]

        f2 = resize_nearest(f2, 2)
        f3 = resize_nearest(f3, 4)
        f4 = resize_nearest(f4, 8)
        fuse = jnp.concatenate([f1, f2, f3, f4], axis=-1)
        if self.use_asf:
            fuse = ScaleFeatureSelection(
                oc * 4, oc, attention_type=self.attention_type, dtype=self.dtype,
                name="concat_attention",
            )(fuse, [f1, f2, f3, f4], train)
        return fuse
