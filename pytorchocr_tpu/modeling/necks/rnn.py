"""Sequence encoder neck (reference pytocr/modeling/necks/rnn.py).

TPU divergence: sequences are **batch-major (N, T, C)** — the reference is
time-major (T, N, C) for torch CTC.  The BiLSTM is a fused single lax.scan
(see BiLSTM docstring); encoder_type in {reshape, fc, rnn}.
"""

from typing import Any

import jax
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
    (reference BidirectionalLSTM, rnn.py:18-36).

    TPU-fused recurrence: instead of two nn.RNN scans each doing an
    input-projection matmul per step, the input projections of BOTH
    directions run as one full-sequence MXU matmul hoisted out of the
    loop, and a single lax.scan carries a direction-batched (2, N, H)
    state — per-step work is one batched (2,N,H)x(2,H,4H) dot_general.
    Same math as two independent LSTMs (gates i,f,g,o; zero init state).
    """

    hidden_size: int
    proj_size: int = 0  # 0 = no projection
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, t, c = x.shape
        hs = self.hidden_size

        # per-gate init (exactly what flax's LSTMCell does per direction:
        # lecun_normal input blocks, orthogonal recurrent blocks) — a single
        # (C, 4H) init changes the per-gate scale and demonstrably slows
        # CTC convergence
        def _blockwise(block_init, block_shape):
            def init(key, shape, dtype=jnp.float32):
                keys = jax.random.split(key, 8)  # works for raw + typed keys
                dirs = [
                    jnp.concatenate(
                        [
                            block_init(keys[d * 4 + g], block_shape, dtype)
                            for g in range(4)
                        ],
                        axis=-1,
                    )
                    for d in range(2)
                ]
                return jnp.stack(dirs)

            return init

        # (direction, in, 4*hidden): 0 = forward, 1 = backward; gates i,f,g,o
        wi = self.param(
            "wi", _blockwise(nn.initializers.lecun_normal(), (c, hs)), (2, c, 4 * hs)
        )
        wh = self.param(
            "wh", _blockwise(nn.initializers.orthogonal(), (hs, hs)), (2, hs, 4 * hs)
        )
        b = self.param("b", nn.initializers.zeros, (2, 4 * hs), jnp.float32)

        xd = jnp.stack([x, jnp.flip(x, axis=1)])  # (2, N, T, C)
        xproj = (
            jnp.einsum("dntc,dck->dntk", xd.astype(self.dtype), wi.astype(self.dtype))
            + b.astype(self.dtype)[:, None, None, :]
        )  # (2, N, T, 4H) — the big hoisted MXU matmul
        xproj = jnp.transpose(xproj, (2, 0, 1, 3))  # (T, 2, N, 4H) scan-major

        wh0 = wh[0].astype(self.dtype)
        wh1 = wh[1].astype(self.dtype)

        def step(carry, xp_t):
            cell, hidden = carry  # f32 carry: cell accumulates across all T
            # steps — keeping it f32 matches the replaced OptimizedLSTMCell
            # numerics under bf16 compute (carry traffic is tiny)
            hc = hidden.astype(self.dtype)
            # two plain (N,H)x(H,4H) dots beat one direction-batched
            # dot_general on the MXU (5.50 vs 5.87 ms at lstm0 scale)
            gates = jnp.stack([xp_t[0] + hc[0] @ wh0, xp_t[1] + hc[1] @ wh1])
            gates = gates.astype(jnp.float32)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            cell = nn.sigmoid(f) * cell + nn.sigmoid(i) * nn.tanh(g)
            hidden = nn.sigmoid(o) * nn.tanh(cell)
            return (cell, hidden), hidden.astype(self.dtype)

        zeros = jnp.zeros((2, n, hs), jnp.float32)
        _, ys = jax.lax.scan(step, (zeros, zeros), xproj, unroll=4)
        # (T, 2, N, H) -> forward as-is; backward outputs are in reversed
        # time order, flip back
        fwd = jnp.transpose(ys[:, 0], (1, 0, 2))
        bwd = jnp.flip(jnp.transpose(ys[:, 1], (1, 0, 2)), axis=1)
        y = jnp.concatenate([fwd, bwd], axis=-1)
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
