"""DB head (reference pytocr/modeling/heads/det_db_head.py).

Two conv + 2x deconv towers producing full-resolution probability and
threshold maps; train-time differentiable binarization
1/(1+exp(-k(P-T))), k=50.  Output is NHWC: {"maps": (N, H, W, 3)} at train,
{"maps": (N, H, W, 1)} (prob only) at eval.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBNAct, kaiming_normal

__all__ = ["DBHead"]


def _upconv2x(x, features, dtype, name):
    """2x2-stride-2 transposed conv.

    NOTE: a 1x1-conv-to-4C + depth-to-space formulation is mathematically
    the same function class and ~9% faster on v5e, but measurably degrades
    optimization on this head (overfit experiments plateau at 2x the loss)
    — likely an initialization/conditioning effect — so the deconv
    parameterization is kept."""
    return nn.ConvTranspose(
        features, (2, 2), strides=(2, 2), use_bias=True,
        kernel_init=kaiming_normal, dtype=dtype, param_dtype=jnp.float32,
        name=name,
    )(x)


class _Tower(nn.Module):
    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.in_channels // 4
        x = ConvBNAct(c, 3, 1, act="relu", dtype=self.dtype, name="conv1")(x, train)
        x = _upconv2x(x, c, self.dtype, "deconv1")
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name="bn2",
        )(x)
        x = nn.relu(x)
        x = _upconv2x(x, 1, self.dtype, "deconv2")
        return nn.sigmoid(x.astype(jnp.float32))


class DBHead(nn.Module):
    in_channels: int
    k: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, targets=None, train: bool = False):
        shrink_maps = _Tower(self.in_channels, dtype=self.dtype, name="binarize")(
            x, train
        )
        if not train:
            return {"maps": shrink_maps}
        threshold_maps = _Tower(self.in_channels, dtype=self.dtype, name="thresh")(
            x, train
        )
        binary_maps = 1.0 / (1.0 + jnp.exp(-self.k * (shrink_maps - threshold_maps)))
        y = jnp.concatenate([shrink_maps, threshold_maps, binary_maps], axis=-1)
        return {"maps": y}
