"""Swin Transformer det backbone (reference pytocr/modeling/backbones/det_swin.py,
the standard microsoft Swin).  NHWC flax: windowed MSA with relative position
bias, shifted windows, patch merging; per-stage LayerNorm output taps.

All shape-dependent padding/masking is computed from static shapes at trace
time (jit-friendly); attention masks for shifted windows are built with
numpy constants.
"""

from typing import Any, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["SwinTransformer"]


def _window_partition(x, ws):
    # (N, H, W, C) -> (N*nH*nW, ws*ws, C)
    n, h, w, c = x.shape
    x = x.reshape(n, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def _window_reverse(windows, ws, h, w):
    n = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(n, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h, w, -1)


def _relative_position_index(ws):
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords_flat = coords.reshape(2, -1)
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws*ws, ws*ws)


def _shift_attn_mask(hp, wp, ws, shift):
    """Attention mask for shifted windows (numpy, static)."""
    img_mask = np.zeros((1, hp, wp, 1))
    h_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    w_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for h in h_slices:
        for w in w_slices:
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mask_windows = img_mask.reshape(1, hp // ws, ws, wp // ws, ws, 1)
    mask_windows = mask_windows.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b_, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (head_dim ** -0.5)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads),
            jnp.float32,
        )
        rel_idx = _relative_position_index(self.window_size).reshape(-1)
        bias = rpb_table[rel_idx].reshape(n, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)[None]  # (1, heads, n, n)
        attn = attn + bias.astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None, :, :].astype(attn.dtype)
            attn = attn.reshape(b_, self.num_heads, n, n)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift_size if ws == self.window_size else 0
        if min(h, w) <= self.window_size:
            shift = 0

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(x)
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        else:
            mask = None

        windows = _window_partition(x, ws)
        attn_out = WindowAttention(
            self.dim, self.num_heads, ws, self.qkv_bias, dtype=self.dtype, name="attn"
        )(windows, mask)
        x = _window_reverse(attn_out, ws, hp, wp)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w, :]

        def drop_path(v):
            if self.drop_path > 0.0 and train:
                keep = 1.0 - self.drop_path
                rng = self.make_rng("dropout")
                m = jax.random.bernoulli(rng, keep, (v.shape[0], 1, 1, 1))
                return v * m / keep
            return v

        x = shortcut + drop_path(x)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(y)
        return x + drop_path(y)


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="reduction")(x)


class SwinTransformer(nn.Module):
    in_channels: int = 3
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> Sequence[int]:
        return [int(self.embed_dim * 2 ** i) for i in range(len(self.depths))]

    @nn.compact
    def __call__(self, x, train: bool = False):
        ps = self.patch_size
        n, h, w, c = x.shape
        pad_b = (ps - h % ps) % ps
        pad_r = (ps - w % ps) % ps
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.Conv(self.embed_dim, (ps, ps), strides=(ps, ps), dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                             name="patch_norm")(x)

        total = sum(self.depths)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]
        outs = []
        cur = 0
        num_layers = len(self.depths)
        for i in range(num_layers):
            dim = int(self.embed_dim * 2 ** i)
            for j in range(self.depths[i]):
                x = SwinBlock(
                    dim,
                    self.num_heads[i],
                    window_size=self.window_size,
                    shift_size=0 if j % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop_path=dpr[cur + j],
                    dtype=self.dtype,
                    name="stage%d_block%d" % (i, j),
                )(x, train)
            cur += self.depths[i]
            if i in self.out_indices:
                out = nn.LayerNorm(
                    epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                    name="out_norm%d" % i,
                )(x)
                outs.append(out)
            if i < num_layers - 1:
                x = PatchMerging(dim, dtype=self.dtype, name="merge%d" % i)(x)
        return outs
