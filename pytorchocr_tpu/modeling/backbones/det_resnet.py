"""Detection ResNet v1.5 (reference pytocr/modeling/backbones/det_resnet.py:143-312).

torchvision-style ResNet 18/34/50/101/152, NHWC, returning the four feature
maps C2..C5 at strides 1/4..1/32.  Optional 3x3 stem (`mode_3x3`) and
last-stage dilation, as in the reference.
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBNAct, finish_residual, quant_max_pool

__all__ = ["ResNet"]

_SPECS = {
    18: ("basic", [2, 2, 2, 2]),
    34: ("basic", [3, 4, 6, 3]),
    50: ("bottleneck", [3, 4, 6, 3]),
    101: ("bottleneck", [3, 4, 23, 3]),
    152: ("bottleneck", [3, 8, 36, 3]),
}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # emit_q: under int8 PTQ every tensor this block writes to HBM is
        # int8 (conv1 out, conv2 out, downsample out, and — via
        # finish_residual — the block output), halving activation traffic
        # on the bandwidth-bound 736x1280 det path. No-op in float/train.
        identity = x
        out = ConvBNAct(
            self.planes, 3, self.stride, dilation=self.dilation, act="relu",
            dtype=self.dtype, emit_q=True, name="conv1",
        )(x, train)
        out = ConvBNAct(
            self.planes, 3, 1, dilation=self.dilation, act=None,
            dtype=self.dtype, emit_q=True, name="conv2",
        )(out, train)
        if self.downsample:
            identity = ConvBNAct(
                self.planes, 1, self.stride, act=None, dtype=self.dtype,
                emit_q=True, name="downsample",
            )(x, train)
        return finish_residual(self, out, identity, self.dtype, nn.relu, train)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBNAct(self.planes, 1, 1, act="relu", dtype=self.dtype,
                        emit_q=True, name="conv1")(x, train)
        # v1.5: stride in the 3x3
        out = ConvBNAct(
            self.planes, 3, self.stride, dilation=self.dilation, act="relu",
            dtype=self.dtype, emit_q=True, name="conv2",
        )(out, train)
        out = ConvBNAct(
            self.planes * self.expansion, 1, 1, act=None, dtype=self.dtype,
            emit_q=True, name="conv3",
        )(out, train)
        if self.downsample:
            identity = ConvBNAct(
                self.planes * self.expansion, 1, self.stride, act=None,
                dtype=self.dtype, emit_q=True, name="downsample",
            )(x, train)
        return finish_residual(self, out, identity, self.dtype, nn.relu, train)


class ResNet(nn.Module):
    in_channels: int = 3
    layers: int = 18
    mode_3x3: bool = False
    dilation_last: bool = False  # dilate stage 4 instead of striding
    # space-to-depth stem (the MLPerf-ResNet TPU optimization): express
    # the 7x7/s2 stem as a 4x4/s1 conv over a 2x2-packed input
    # (N,H/2,W/2,4*Cin).  Same function class (a 7x7 filter zero-padded
    # to 8x8 repacks exactly into 4x4 x 4Cin), but stride-1 with a
    # channel count that tiles the MXU instead of Cin=3 — targets the
    # stem's conv-backprop kernels, the worst stride-boundary gradient
    # case (benchmarks/bench_bwd_stages.py).  Param shape differs from
    # the torch stem, so pretrained ingestion requires repacking; off by
    # default for checkpoint compatibility.
    stem_space_to_depth: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> Sequence[int]:
        block, _ = _SPECS[self.layers]
        exp = 1 if block == "basic" else 4
        return [64 * exp, 128 * exp, 256 * exp, 512 * exp]

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.layers in _SPECS, "ResNet layers must be in %s" % list(_SPECS)
        block_type, counts = _SPECS[self.layers]
        Block = BasicBlock if block_type == "basic" else Bottleneck
        exp = 1 if block_type == "basic" else 4

        if self.mode_3x3:
            x = ConvBNAct(32, 3, 2, act="relu", dtype=self.dtype, name="stem1")(x, train)
            x = ConvBNAct(32, 3, 1, act="relu", dtype=self.dtype, name="stem2")(x, train)
            x = ConvBNAct(64, 3, 1, act="relu", dtype=self.dtype, name="stem3")(x, train)
        elif self.stem_space_to_depth:
            n, h, w, c = x.shape
            x = x.reshape(n, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
            # 4x4/s1 with pad (2,1): packed pixels o-2..o+1 cover raw
            # columns 2o-4..2o+3 ⊇ the 7x7/s2 receptive field 2o-3..2o+3
            x = ConvBNAct(
                64, 4, 1, padding=[(2, 1), (2, 1)], act="relu",
                dtype=self.dtype, emit_q=True, name="stem_s2d",
            )(x, train)
        else:
            x = ConvBNAct(
                64, 7, 2, padding=3, act="relu", dtype=self.dtype,
                emit_q=True, name="stem",
            )(x, train)
        x = quant_max_pool(x, 3, 2, 1)

        outs = []
        planes = [64, 128, 256, 512]
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            dilation = 1
            if stage == 3 and self.dilation_last:
                stride, dilation = 1, 2
            for i in range(counts[stage]):
                s = stride if i == 0 else 1
                ch = getattr(x, "q", x).shape[-1]  # x may be an int8 QTensor
                need_ds = i == 0 and (s != 1 or ch != planes[stage] * exp)
                x = Block(
                    planes[stage],
                    stride=s,
                    downsample=need_ds,
                    dilation=dilation,
                    dtype=self.dtype,
                    name="layer%d_block%d" % (stage + 1, i),
                )(x, train)
            outs.append(x)
        return outs
