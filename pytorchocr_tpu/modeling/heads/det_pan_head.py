"""PAN head (reference pytocr/modeling/heads/det_pan_head.py): 6 channels =
text + kernel + 4-dim embedding logit maps at 1/4 resolution, NHWC."""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBNAct, kaiming_normal

__all__ = ["PANHead"]


class PANHead(nn.Module):
    in_channels: int
    hidden_dim: int = 128
    out_channels: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, targets=None, train: bool = False):
        x = ConvBNAct(
            self.hidden_dim, 3, 1, use_bias=True, act="relu", dtype=self.dtype,
            name="conv1",
        )(x, train)
        x = nn.Conv(
            self.out_channels, (1, 1), use_bias=True, kernel_init=kaiming_normal,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv2",
        )(x)
        return {"maps": x.astype(jnp.float32)}
