"""Sequence encoder neck (reference pytocr/modeling/necks/rnn.py).

TPU divergence: sequences are **batch-major (N, T, C)** — the reference is
time-major (T, N, C) for torch CTC.  The BiLSTM runs as a lax.scan via
flax nn.RNN over nn.OptimizedLSTMCell; encoder_type in {reshape, fc, rnn}.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["SequenceEncoder", "Im2Seq"]


class Im2Seq(nn.Module):
    """(N, 1, W, C) -> (N, T=W, C) (reference rnn.py:4-15)."""

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        assert h == 1, "the height of backbone output featuremap must be 1"
        return x[:, 0, :, :]


class BiLSTM(nn.Module):
    """Bidirectional LSTM; optional output projection
    (reference BidirectionalLSTM, rnn.py:18-36)."""

    hidden_size: int
    proj_size: int = 0  # 0 = no projection
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype, param_dtype=jnp.float32),
            name="fwd",
        )
        bwd = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype, param_dtype=jnp.float32),
            reverse=True,
            keep_order=True,
            name="bwd",
        )
        y = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
        if self.proj_size:
            y = nn.Dense(
                self.proj_size, dtype=self.dtype, param_dtype=jnp.float32, name="embedding"
            )(y)
        return y


class EncoderWithRNN(nn.Module):
    """2 stacked BiLSTMs, first projected back to hidden_size
    (reference EncoderWithRNN, rnn.py:39-49); out_channels = hidden*2."""

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = BiLSTM(self.hidden_size, self.hidden_size, dtype=self.dtype, name="lstm0")(x)
        x = BiLSTM(self.hidden_size, 0, dtype=self.dtype, name="lstm1")(x)
        return x


class EncoderWithFC(nn.Module):
    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.hidden_size, dtype=self.dtype, param_dtype=jnp.float32, name="fc"
        )(x)


class SequenceEncoder(nn.Module):
    """Im2Seq + {reshape|fc|rnn} encoder (reference rnn.py:66-91)."""

    in_channels: int
    encoder_type: str = "rnn"
    hidden_size: int = 256
    dtype: Any = jnp.float32

    @property
    def out_channels(self):
        if self.encoder_type == "reshape":
            return self.in_channels
        if self.encoder_type == "fc":
            return self.hidden_size
        if self.encoder_type == "rnn":
            return self.hidden_size * 2
        raise ValueError("encoder_type must be in [reshape, fc, rnn]")

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Im2Seq(name="encoder_reshape")(x)
        if self.encoder_type == "reshape":
            return x
        if self.encoder_type == "fc":
            return EncoderWithFC(self.hidden_size, dtype=self.dtype, name="encoder")(x)
        if self.encoder_type == "rnn":
            return EncoderWithRNN(self.hidden_size, dtype=self.dtype, name="encoder")(x)
        raise ValueError("encoder_type must be in [reshape, fc, rnn]")
