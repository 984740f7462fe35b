"""CTC head (reference pytocr/modeling/heads/rec_ctc_head.py).

Batch-major: (N, T, C_in) -> (N, T, n_class) logits at train; softmax
probabilities at eval (matching the reference's eval-time softmax).
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["CTCHead"]


class CTCHead(nn.Module):
    in_channels: int
    out_channels: int
    return_feats: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, targets=None, train: bool = False):
        predicts = nn.Dense(
            self.out_channels, dtype=self.dtype, param_dtype=jnp.float32, name="fc"
        )(x)
        if not train:
            return nn.softmax(predicts.astype(jnp.float32), axis=2)
        if self.return_feats:
            return (x, predicts)
        return predicts
