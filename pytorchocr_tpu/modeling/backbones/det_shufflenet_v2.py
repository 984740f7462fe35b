"""ShuffleNetV2 det backbone (reference pytocr/modeling/backbones/det_shufflenet_v2.py),
NHWC flax.  Output taps: [after maxpool (1/4), stage2 (1/8), stage3 (1/16),
conv5 (1/32)]."""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBNAct, max_pool

__all__ = ["ShuffleNetV2"]

_SPECS = {
    0.1: ([2, 4, 2], [16, 24, 48, 96, 512]),
    0.5: ([4, 8, 4], [24, 48, 96, 192, 1024]),
    1.0: ([4, 8, 4], [24, 116, 232, 464, 1024]),
    1.5: ([4, 8, 4], [24, 176, 352, 704, 1024]),
    2.0: ([4, 8, 4], [24, 244, 488, 976, 2048]),
}


def channel_shuffle(x, groups):
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)


class InvertedResidual(nn.Module):
    oup: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        branch_features = self.oup // 2
        if self.stride > 1:
            inp = x.shape[-1]
            b1 = ConvBNAct(
                inp, 3, self.stride, groups=inp, act=None, dtype=self.dtype, name="b1dw"
            )(x, train)
            b1 = ConvBNAct(branch_features, 1, 1, act="relu", dtype=self.dtype,
                           name="b1pw")(b1, train)
            x2 = x
        else:
            x1, x2 = jnp.split(x, 2, axis=-1)
            b1 = x1
        b2 = ConvBNAct(branch_features, 1, 1, act="relu", dtype=self.dtype,
                       name="b2pw1")(x2, train)
        b2 = ConvBNAct(
            branch_features, 3, self.stride, groups=branch_features, act=None,
            dtype=self.dtype, name="b2dw",
        )(b2, train)
        b2 = ConvBNAct(branch_features, 1, 1, act="relu", dtype=self.dtype,
                       name="b2pw2")(b2, train)
        out = jnp.concatenate([b1, b2], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2(nn.Module):
    in_channels: int = 3
    scale: float = 0.5
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> Sequence[int]:
        _, ch = _SPECS[self.scale]
        return [ch[0], ch[1], ch[2], ch[4]]

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.scale in _SPECS, "supported scale: %s" % list(_SPECS)
        repeats, ch = _SPECS[self.scale]

        x = ConvBNAct(ch[0], 3, 2, act="relu", dtype=self.dtype, name="conv1")(x, train)
        x = max_pool(x, 3, 2, 1)
        outs = [x]
        for si, (rep, oc) in enumerate(zip(repeats, ch[1:4])):
            x = InvertedResidual(oc, 2, dtype=self.dtype, name="stage%d_0" % (si + 2))(
                x, train
            )
            for i in range(rep - 1):
                x = InvertedResidual(
                    oc, 1, dtype=self.dtype, name="stage%d_%d" % (si + 2, i + 1)
                )(x, train)
            if si < 2:
                outs.append(x)
        x = ConvBNAct(ch[4], 1, 1, padding=0, act="relu", dtype=self.dtype,
                      name="conv5")(x, train)
        outs.append(x)
        return outs
