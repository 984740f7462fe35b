"""CSP-PAN neck (reference pytocr/modeling/necks/csp_pan.py:150-244), NHWC.

Channel_T 1x1 unify -> CSP top-down -> CSP bottom-up; mode="table" returns
N5 only, else upsample-concat fuse (optionally ASF-attended)."""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBNAct, resize_nearest
from .asf import ScaleFeatureSelection

__all__ = ["CSPPAN"]

_ACT = "leakyrelu"


class _ConvUnit(nn.Module):
    """CNA or DPModule depending on use_depthwise (reference conv_func)."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    depthwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.depthwise:
            in_ch = x.shape[-1]
            x = ConvBNAct(in_ch, self.kernel, self.stride, groups=in_ch, act=_ACT,
                          dtype=self.dtype, name="dw")(x, train)
            x = ConvBNAct(self.out_ch, 1, 1, act=_ACT, dtype=self.dtype, name="pw")(
                x, train
            )
            return x
        return ConvBNAct(self.out_ch, self.kernel, self.stride, act=_ACT,
                         dtype=self.dtype, name="cna")(x, train)


class _DarknetBottleneck(nn.Module):
    out_ch: int
    kernel: int = 3
    expansion: float = 0.5
    add_identity: bool = True
    depthwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_ch * self.expansion)
        identity = x
        out = ConvBNAct(hidden, 1, 1, act=_ACT, dtype=self.dtype, name="conv1")(
            x, train
        )
        out = _ConvUnit(self.out_ch, self.kernel, 1, self.depthwise,
                        dtype=self.dtype, name="conv2")(out, train)
        if self.add_identity and x.shape[-1] == self.out_ch:
            return out + identity
        return out


class _CSPModule(nn.Module):
    out_ch: int
    kernel: int = 3
    expand_ratio: float = 0.5
    num_blocks: int = 1
    add_identity: bool = True
    depthwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.out_ch * self.expand_ratio)
        x_short = ConvBNAct(mid, 1, 1, act=_ACT, dtype=self.dtype, name="short")(
            x, train
        )
        x_main = ConvBNAct(mid, 1, 1, act=_ACT, dtype=self.dtype, name="main")(x, train)
        for i in range(self.num_blocks):
            x_main = _DarknetBottleneck(
                mid, self.kernel, 1.0, self.add_identity, self.depthwise,
                dtype=self.dtype, name="block%d" % i,
            )(x_main, train)
        x_final = jnp.concatenate([x_main, x_short], axis=-1)
        return ConvBNAct(self.out_ch, 1, 1, act=_ACT, dtype=self.dtype, name="final")(
            x_final, train
        )


class CSPPAN(nn.Module):
    in_channels: Sequence[int]
    out_channels: int
    kernel_size: int = 5
    num_csp_blocks: int = 1
    use_depthwise: bool = True
    mode: str = "det"
    use_asf: bool = False
    attention_type: str = "scale_spatial"
    dtype: Any = jnp.float32

    @property
    def fused_channels(self):
        if self.mode == "table":
            return self.out_channels
        return self.out_channels * 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.out_channels
        n_levels = len(x)
        # Channel_T: unify channels per level
        x = [
            ConvBNAct(oc, 1, 1, act=_ACT, dtype=self.dtype, name="conv_t%d" % i)(
                xi, train
            )
            for i, xi in enumerate(x)
        ]

        # top-down
        inner_outs = [x[-1]]
        for idx in range(n_levels - 1, 0, -1):
            feat_high = inner_outs[0]
            feat_low = x[idx - 1]
            upsample_feat = resize_nearest(feat_high, 2)
            inner_out = _CSPModule(
                oc, self.kernel_size, num_blocks=self.num_csp_blocks,
                add_identity=False, depthwise=self.use_depthwise,
                dtype=self.dtype, name="td%d" % (n_levels - 1 - idx),
            )(jnp.concatenate([upsample_feat, feat_low], axis=-1), train)
            inner_outs.insert(0, inner_out)

        # bottom-up
        outs = [inner_outs[0]]
        for idx in range(n_levels - 1):
            feat_low = outs[-1]
            feat_high = inner_outs[idx + 1]
            downsample_feat = _ConvUnit(
                oc, self.kernel_size, 2, self.use_depthwise, dtype=self.dtype,
                name="down%d" % idx,
            )(feat_low, train)
            out = _CSPModule(
                oc, self.kernel_size, num_blocks=self.num_csp_blocks,
                add_identity=False, depthwise=self.use_depthwise,
                dtype=self.dtype, name="bu%d" % idx,
            )(jnp.concatenate([downsample_feat, feat_high], axis=-1), train)
            outs.append(out)

        if self.mode == "table":
            return outs[-1]
        outs[-1] = resize_nearest(outs[-1], 8)
        outs[-2] = resize_nearest(outs[-2], 4)
        outs[-3] = resize_nearest(outs[-3], 2)
        fuse = jnp.concatenate(outs, axis=-1)
        if self.use_asf:
            fuse = ScaleFeatureSelection(
                oc * 4, oc, attention_type=self.attention_type, dtype=self.dtype,
                name="concat_attention",
            )(fuse, outs, train)
        return fuse
