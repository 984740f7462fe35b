"""MobileNetV3 backbone (reference pytocr/modeling/backbones/det_mobilenet_v3.py,
torchvision-style inverted residuals), NHWC flax.

Det variant: feature taps at stage boundaries -> 4 maps.
Rec variant (rec_mobilenet_v3.py): depthwise strides are (s, 1) so only the
height shrinks inside the stack, with a final 2x2 avg-pool.
"""

from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBNAct, hard_sigmoid, make_divisible

__all__ = ["MobileNetV3", "mobilenet_v3_conf", "InvertedResidual"]


def mobilenet_v3_conf(arch, width_mult=1.0, use_se=True, rec=False):
    """(in, kernel, exp, out, se, act, stride) rows; rec variant turns the C3
    stride-2 into stride-1 (reference rec_mobilenet_v3.py:290,305)."""

    def adj(c):
        return make_divisible(c * width_mult, 8)

    if arch == "large":
        c3_stride = 1 if rec else 2
        rows = [
            (16, 3, 16, 16, False, "RE", 1),
            (16, 3, 64, 24, False, "RE", 2),
            (24, 3, 72, 24, False, "RE", 1),
            (24, 5, 72, 40, use_se, "RE", 2),
            (40, 5, 120, 40, use_se, "RE", 1),
            (40, 5, 120, 40, use_se, "RE", 1),
            (40, 3, 240, 80, False, "HS", c3_stride),
            (80, 3, 200, 80, False, "HS", 1),
            (80, 3, 184, 80, False, "HS", 1),
            (80, 3, 184, 80, False, "HS", 1),
            (80, 3, 480, 112, use_se, "HS", 1),
            (112, 3, 672, 112, use_se, "HS", 1),
            (112, 5, 672, 160, True, "HS", 2),
            (160, 5, 960, 160, True, "HS", 1),
            (160, 5, 960, 160, True, "HS", 1),
        ]
    elif arch == "small":
        c3_stride = 1 if rec else 2
        rows = [
            (16, 3, 16, 16, use_se, "RE", 2),
            (16, 3, 72, 24, False, "RE", 2),
            (24, 3, 88, 24, False, "RE", 1),
            (24, 5, 96, 40, use_se, "HS", c3_stride),
            (40, 5, 240, 40, use_se, "HS", 1),
            (40, 5, 240, 40, use_se, "HS", 1),
            (40, 5, 120, 48, use_se, "HS", 1),
            (48, 5, 144, 48, use_se, "HS", 1),
            (48, 5, 288, 96, True, "HS", 2),
            (96, 5, 576, 96, True, "HS", 1),
            (96, 5, 576, 96, True, "HS", 1),
        ]
    else:
        raise ValueError("Unsupported model type {}".format(arch))
    return [
        dict(
            in_ch=adj(r[0]),
            kernel=r[1],
            exp=adj(r[2]),
            out=adj(r[3]),
            se=r[4],
            act="hardswish" if r[5] == "HS" else "relu",
            stride=r[6],
        )
        for r in rows
    ]


class _SE(nn.Module):
    """torchvision SqueezeExcitation: squeeze = make_divisible(c/4, 8),
    relu + hardsigmoid."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        squeeze = make_divisible(self.channels // 4, 8)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(squeeze, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="fc2")(s)
        return x * hard_sigmoid(s)


class InvertedResidual(nn.Module):
    cnf: dict
    rec: bool = False  # (stride, 1) depthwise for recognition
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cnf = self.cnf
        identity = x
        out = x
        bn = dict(bn_eps=1e-3, bn_momentum=0.99)
        if cnf["exp"] != cnf["in_ch"]:
            out = ConvBNAct(cnf["exp"], 1, 1, act=cnf["act"], dtype=self.dtype,
                            name="expand", **bn)(out, train)
        stride = (cnf["stride"], 1) if self.rec else cnf["stride"]
        out = ConvBNAct(
            cnf["exp"], cnf["kernel"], stride, groups=cnf["exp"], act=cnf["act"],
            dtype=self.dtype, name="dw", **bn,
        )(out, train)
        if cnf["se"]:
            out = _SE(cnf["exp"], dtype=self.dtype, name="se")(out)
        out = ConvBNAct(cnf["out"], 1, 1, act=None, dtype=self.dtype,
                        name="project", **bn)(out, train)
        if cnf["stride"] == 1 and cnf["in_ch"] == cnf["out"]:
            out = out + identity
        return out


class MobileNetV3(nn.Module):
    in_channels: int = 3
    model_name: str = "large"
    width_mult: float = 1.0
    use_se: bool = True
    dtype: Any = jnp.float32

    def _conf(self):
        assert self.width_mult in [0.35, 0.5, 0.75, 1.0, 1.25]
        return mobilenet_v3_conf(self.model_name, self.width_mult, self.use_se)

    @property
    def out_channels(self) -> Sequence[int]:
        conf = self._conf()
        start_idx = 2 if self.model_name == "large" else 0
        outs = []
        for i, cnf in enumerate(conf):
            if cnf["stride"] == 2 and i > start_idx:
                outs.append(cnf["in_ch"])
        outs.append(6 * conf[-1]["out"])
        return outs

    @nn.compact
    def __call__(self, x, train: bool = False):
        conf = self._conf()
        x = ConvBNAct(
            conf[0]["in_ch"], 3, 2, act="hardswish", dtype=self.dtype,
            bn_eps=1e-3, bn_momentum=0.99, name="conv1",
        )(x, train)

        start_idx = 2 if self.model_name == "large" else 0
        outs: List = []
        for i, cnf in enumerate(conf):
            if cnf["stride"] == 2 and i > start_idx:
                outs.append(x)
            x = InvertedResidual(cnf, dtype=self.dtype, name="block%d" % i)(x, train)
        x = ConvBNAct(
            6 * conf[-1]["out"], 1, 1, act="hardswish", dtype=self.dtype,
            bn_eps=1e-3, bn_momentum=0.99, name="lastconv",
        )(x, train)
        outs.append(x)
        return outs
