"""Direction-classifier head (reference pytocr/modeling/heads/cls_head.py):
global average pool -> Dense -> softmax at eval."""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ClsHead"]


class ClsHead(nn.Module):
    in_channels: int
    class_dim: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, targets=None, train: bool = False):
        x = jnp.mean(x, axis=(1, 2))  # NHWC GAP
        x = nn.Dense(
            self.class_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc"
        )(x)
        if not train:
            x = nn.softmax(x.astype(jnp.float32), axis=1)
        return x
