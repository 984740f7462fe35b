"""Recognition (height-collapsing) ResNet
(reference pytocr/modeling/backbones/rec_resnet.py:144-272):
7x7 stride-1 stem, 3x3/s2 maxpool, residual stages with (s, 1) strides
(height-only downsampling), final 2x2 avg-pool -> (N, 1, W/4, C)."""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBNAct, max_pool

__all__ = ["ResNet"]

_SPECS = {
    18: ("basic", [2, 2, 2, 2]),
    34: ("basic", [3, 4, 6, 3]),
    50: ("bottleneck", [3, 4, 6, 3]),
    101: ("bottleneck", [3, 4, 23, 3]),
    152: ("bottleneck", [3, 8, 36, 3]),
}


class _RecBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBNAct(
            self.planes, 3, (self.stride, 1), act="relu", dtype=self.dtype, name="conv1"
        )(x, train)
        out = ConvBNAct(self.planes, 3, 1, act=None, dtype=self.dtype, name="conv2")(
            out, train
        )
        if self.downsample:
            identity = ConvBNAct(
                self.planes, 1, (self.stride, 1), act=None, dtype=self.dtype,
                name="downsample",
            )(x, train)
        return nn.relu(out + identity)


class _RecBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBNAct(self.planes, 1, 1, act="relu", dtype=self.dtype, name="conv1")(
            x, train
        )
        out = ConvBNAct(
            self.planes, 3, (self.stride, 1), act="relu", dtype=self.dtype, name="conv2"
        )(out, train)
        out = ConvBNAct(
            self.planes * self.expansion, 1, 1, act=None, dtype=self.dtype, name="conv3"
        )(out, train)
        if self.downsample:
            identity = ConvBNAct(
                self.planes * self.expansion, 1, (self.stride, 1), act=None,
                dtype=self.dtype, name="downsample",
            )(x, train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    in_channels: int = 3
    layers: int = 50
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        block, _ = _SPECS[self.layers]
        return 512 * (1 if block == "basic" else 4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.layers in _SPECS
        block_type, counts = _SPECS[self.layers]
        Block = _RecBasicBlock if block_type == "basic" else _RecBottleneck
        exp = 1 if block_type == "basic" else 4

        x = ConvBNAct(64, 7, 1, padding=3, act="relu", dtype=self.dtype, name="stem")(
            x, train
        )
        x = max_pool(x, 3, 2, 1)

        planes = [64, 128, 256, 512]
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            for i in range(counts[stage]):
                s = stride if i == 0 else 1
                need_ds = i == 0 and (s != 1 or x.shape[-1] != planes[stage] * exp)
                x = Block(
                    planes[stage], stride=s, downsample=need_ds, dtype=self.dtype,
                    name="layer%d_block%d" % (stage + 1, i),
                )(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x
