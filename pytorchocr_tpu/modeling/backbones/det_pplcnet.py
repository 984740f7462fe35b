"""PP-LCNet table/det backbone (reference pytocr/modeling/backbones/det_pplcnet.py),
NHWC flax: depthwise-separable blocks with hardswish, SE in the last stage."""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBNAct, SEModule, make_divisible

__all__ = ["PPLCNet"]

NET_CONFIG = {
    # k, in_c, out_c, s, use_se
    "blocks2": [[3, 16, 32, 1, False]],
    "blocks3": [[3, 32, 64, 2, False], [3, 64, 64, 1, False]],
    "blocks4": [[3, 64, 128, 2, False], [3, 128, 128, 1, False]],
    "blocks5": [
        [3, 128, 256, 2, False], [5, 256, 256, 1, False], [5, 256, 256, 1, False],
        [5, 256, 256, 1, False], [5, 256, 256, 1, False], [5, 256, 256, 1, False],
    ],
    "blocks6": [[5, 256, 512, 2, True], [5, 512, 512, 1, True]],
}


class _DPBlock(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    use_se: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = ConvBNAct(
            in_ch, self.kernel, self.stride, groups=in_ch, act="hardswish",
            dtype=self.dtype, name="dw",
        )(x, train)
        if self.use_se:
            x = SEModule(in_ch, dtype=self.dtype, name="se")(x)
        x = ConvBNAct(self.out_ch, 1, 1, act="hardswish", dtype=self.dtype, name="pw")(
            x, train
        )
        return x


class PPLCNet(nn.Module):
    in_channels: int = 3
    scale: float = 1.0
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> Sequence[int]:
        return [
            int(NET_CONFIG["blocks3"][-1][2] * self.scale),
            int(NET_CONFIG["blocks4"][-1][2] * self.scale),
            int(NET_CONFIG["blocks5"][-1][2] * self.scale),
            int(NET_CONFIG["blocks6"][-1][2] * self.scale),
        ]

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.scale
        x = ConvBNAct(
            make_divisible(16 * s), 3, 2, act="hardswish", dtype=self.dtype,
            name="conv1",
        )(x, train)
        for k, in_c, out_c, st, se in NET_CONFIG["blocks2"]:
            x = _DPBlock(make_divisible(out_c * s), k, st, se, dtype=self.dtype,
                         name="blocks2_0")(x, train)
        outs = []
        for bi in range(3, 7):
            for j, (k, in_c, out_c, st, se) in enumerate(NET_CONFIG["blocks%d" % bi]):
                x = _DPBlock(
                    make_divisible(out_c * s), k, st, se, dtype=self.dtype,
                    name="blocks%d_%d" % (bi, j),
                )(x, train)
            outs.append(x)
        return outs
