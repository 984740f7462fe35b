"""Recognition MobileNetV3 (reference pytocr/modeling/backbones/rec_mobilenet_v3.py):
stride-2 stem on both axes, (s, 1) depthwise strides inside the stack (only
height shrinks), C3 stride dropped to 1, final 2x2 avg-pool collapsing to
(N, 1, W/4, C)."""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBNAct
from .det_mobilenet_v3 import InvertedResidual, mobilenet_v3_conf

__all__ = ["MobileNetV3"]


class MobileNetV3(nn.Module):
    in_channels: int = 1
    model_name: str = "small"
    width_mult: float = 1.0
    use_se: bool = True
    dtype: Any = jnp.float32

    def _conf(self):
        assert self.width_mult in [0.35, 0.5, 0.75, 1.0, 1.25]
        return mobilenet_v3_conf(
            self.model_name, self.width_mult, self.use_se, rec=True
        )

    @property
    def out_channels(self) -> int:
        return 6 * self._conf()[-1]["out"]

    @nn.compact
    def __call__(self, x, train: bool = False):
        conf = self._conf()
        x = ConvBNAct(
            conf[0]["in_ch"], 3, 2, act="hardswish", dtype=self.dtype,
            bn_eps=1e-3, bn_momentum=0.99, name="conv1",
        )(x, train)
        for i, cnf in enumerate(conf):
            x = InvertedResidual(cnf, rec=True, dtype=self.dtype, name="block%d" % i)(
                x, train
            )
        x = ConvBNAct(
            6 * conf[-1]["out"], 1, 1, act="hardswish", dtype=self.dtype,
            bn_eps=1e-3, bn_momentum=0.99, name="lastconv",
        )(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x
