"""CRNN VGG backbone (reference pytocr/modeling/backbones/rec_vgg.py:8-121).

NHWC; input (N, 32, W, C) -> output (N, 1, W/4, out_channels): same conv/pool
schedule as the reference (two 2x2 pools, two (2,2)/(2,1) pools with (0,1)
width padding, final 2x1x0 conv collapsing height).
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBNAct, max_pool

__all__ = ["VGG"]

_CFG = {
    ("v1", 0.5): dict(nm=[32, 64, 128, 128, 256, 256, 512]),
    ("v1", 1.0): dict(nm=[64, 128, 256, 256, 512, 512, 512]),
    ("v2", 0.5): dict(nm=[32, 64, 128, 128, 256, 256, 256]),
    ("v2", 1.0): dict(nm=[24, 128, 256, 256, 512, 512, 512]),
}
_KS_V1 = [3, 3, 3, 3, 3, 3, 2]
_PS_V1 = [1, 1, 1, 1, 1, 1, 0]
_SS_V1 = [1, 1, 1, 1, 1, 1, 1]
_KS_V2 = [5, 3, 3, 3, 3, 3, 2]
_PS_V2 = [2, 1, 1, 1, 1, 1, 0]
_SS_V2 = [2, 1, 1, 1, 1, 1, 1]


class _ConvRelu(nn.Module):
    """One VGG stage: v1 = plain conv(+BN)+ReLU; v2 = depthwise+project."""

    idx: int
    model_name: str
    n_out: int
    bn: bool
    leaky_relu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        i = self.idx
        if self.model_name == "v1":
            x = ConvBNAct(
                self.n_out,
                _KS_V1[i],
                _SS_V1[i],
                padding=_PS_V1[i],
                use_bias=True,
                use_bn=self.bn,
                act="leakyrelu0.2" if self.leaky_relu else "relu",  # torch slope 0.2 (rec_vgg.py:57)
                dtype=self.dtype,
                name="conv%d" % i,
            )(x, train)
        else:  # v2: first stage plain conv, others depthwise + 1x1 project
            if i == 0:
                x = ConvBNAct(
                    self.n_out,
                    _KS_V2[i],
                    _SS_V2[i],
                    padding=_PS_V2[i],
                    use_bias=True,
                    use_bn=False,
                    act="relu",
                    dtype=self.dtype,
                    name="conv%d" % i,
                )(x, train)
            else:
                n_in = x.shape[-1]
                x = ConvBNAct(
                    n_in,
                    _KS_V2[i],
                    _SS_V2[i],
                    padding=_PS_V2[i],
                    groups=n_in,
                    use_bias=True,
                    use_bn=self.bn,
                    act="relu",
                    dtype=self.dtype,
                    name="convdw%d" % i,
                )(x, train)
                x = ConvBNAct(
                    self.n_out,
                    1,
                    1,
                    padding=0,
                    use_bias=True,
                    use_bn=self.bn,
                    act="relu",
                    dtype=self.dtype,
                    name="convproject%d" % i,
                )(x, train)
        return x


class VGG(nn.Module):
    in_channels: int = 3
    model_name: str = "v1"
    scale: float = 1.0
    leaky_relu: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self):
        return _CFG[(self.model_name, self.scale)]["nm"][-1]

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert (self.model_name, self.scale) in _CFG, (
            "supported (model_name, scale): %s" % list(_CFG)
        )
        nm = _CFG[(self.model_name, self.scale)]["nm"]
        mn = self.model_name

        def stage(i, x, bn=False):
            return _ConvRelu(
                i, mn, nm[i], bn, leaky_relu=self.leaky_relu,
                dtype=self.dtype, name="stage%d" % i,
            )(x, train)

        x = stage(0, x)
        if mn == "v1":
            x = max_pool(x, 2, 2)  # H/2
        x = stage(1, x)
        x = max_pool(x, 2, 2)  # H/4, W/4 (v1) | v2: stride-2 stem already
        x = stage(2, x, bn=True)
        x = stage(3, x)
        x = max_pool(x, (2, 2), (2, 1), (0, 1))  # H/8, W/4(+pad)
        x = stage(4, x, bn=True)
        x = stage(5, x)
        x = max_pool(x, (2, 2), (2, 1), (0, 1))  # H/16
        x = stage(6, x, bn=True)  # 2x1 conv, no pad -> H collapses to 1
        return x
