"""TPS/STN rectification for STAR-Net (reference pytocr/modeling/transforms/tps.py).

TPU-first fixes vs the reference:
  * the TPS system matrices inv_delta_C (F+3 x F+3) and P_hat (n x F+3)
    depend only on num_fiducial and the STATIC input shape — they are
    computed once at trace time as numpy constants (the reference rebuilds
    and re-registers them on every forward, tps.py:113-126);
  * grid_sample is a gather-based bilinear interpolation in NHWC with
    border padding semantics.
"""

from typing import Any

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBNAct, max_pool

__all__ = ["TPS"]


def _build_C(F):
    ctrl_pts_x = np.linspace(-1.0, 1.0, F // 2)
    top = np.stack([ctrl_pts_x, -np.ones(F // 2)], axis=1)
    bottom = np.stack([ctrl_pts_x, np.ones(F // 2)], axis=1)
    return np.concatenate([top, bottom], axis=0)  # (F, 2)


def _build_inv_delta_C(C):
    F = C.shape[0]
    hat_C = np.zeros((F, F))
    for i in range(F):
        for j in range(i, F):
            r = np.linalg.norm(C[i] - C[j])
            hat_C[i, j] = hat_C[j, i] = r
    np.fill_diagonal(hat_C, 1)
    hat_C = (hat_C ** 2) * np.log(hat_C)
    delta_C = np.concatenate(
        [
            np.concatenate([np.ones((F, 1)), C, hat_C], axis=1),
            np.concatenate([np.zeros((2, 3)), C.T], axis=1),
            np.concatenate([np.zeros((1, 3)), np.ones((1, F))], axis=1),
        ],
        axis=0,
    )
    return np.linalg.inv(delta_C)  # (F+3, F+3)


def _build_P_hat(C, h, w, eps=1e-6):
    gx = (np.arange(-w, w, 2) + 1.0) / w
    gy = (np.arange(-h, h, 2) + 1.0) / h
    P = np.stack(np.meshgrid(gx, gy), axis=2).reshape(-1, 2)  # (n, 2)
    F = C.shape[0]
    P_diff = P[:, None, :] - C[None, :, :]
    rbf_norm = np.linalg.norm(P_diff, axis=2)
    rbf = np.square(rbf_norm) * np.log(rbf_norm + eps)
    return np.concatenate([np.ones((P.shape[0], 1)), P, rbf], axis=1)  # (n, F+3)


def grid_sample_bilinear(img, grid):
    """img (N, H, W, C); grid (N, Hg, Wg, 2) with xy in [-1, 1]; border pad."""
    n, h, w, c = img.shape
    x = (grid[..., 0] + 1.0) * (w - 1) / 2.0
    y = (grid[..., 1] + 1.0) * (h - 1) / 2.0
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)

    def gather(yy, xx):
        idx_b = jnp.arange(n)[:, None, None]
        return img[idx_b, yy, xx]

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


class LocalizationNetwork(nn.Module):
    num_fiducial: int
    model_name: str = "small"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        F = self.num_fiducial
        if self.model_name == "large":
            num_filters_list = [64, 128, 256, 512]
            fc_dim = 256
        else:
            num_filters_list = [16, 32, 64, 128]
            fc_dim = 64
        for idx, nf in enumerate(num_filters_list):
            x = ConvBNAct(nf, 3, 1, act="relu", dtype=self.dtype,
                          name="conv%d" % idx)(x, train)
            if idx == len(num_filters_list) - 1:
                x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (N, C)
            else:
                x = max_pool(x, 2, 2)
        x = nn.Dense(fc_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = nn.relu(x)

        # RARE-style init: zero weights, fiducial-grid bias (tps.py:76-86)
        ctrl_pts_x = np.linspace(-1.0, 1.0, F // 2)
        ctrl_pts_y_top = np.linspace(0.0, -1.0, F // 2)
        ctrl_pts_y_bottom = np.linspace(1.0, 0.0, F // 2)
        initial_bias = np.concatenate(
            [
                np.stack([ctrl_pts_x, ctrl_pts_y_top], axis=1),
                np.stack([ctrl_pts_x, ctrl_pts_y_bottom], axis=1),
            ],
            axis=0,
        ).reshape(-1)
        x = nn.Dense(
            F * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                initial_bias, dtype
            ),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc2",
        )(x)
        return x.reshape(-1, F, 2)


class TPS(nn.Module):
    in_channels: int
    num_fiducial: int = 20
    model_name: str = "small"
    dtype: Any = jnp.float32

    @property
    def out_channels(self):
        return self.in_channels

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        F = self.num_fiducial
        batch_C_prime = LocalizationNetwork(
            F, self.model_name, dtype=self.dtype, name="loc_net"
        )(x, train).astype(jnp.float32)

        # static TPS system matrices (computed once per compiled shape)
        C = _build_C(F)
        inv_delta_C = jnp.asarray(_build_inv_delta_C(C), jnp.float32)
        P_hat = jnp.asarray(_build_P_hat(C, h, w), jnp.float32)

        # get_expand: learned 3x2 tail appended to C' (reference
        # tps.py:203-207).  ZERO-initialized: the TPS solve requires the
        # 3 constraint rows to be zero (clovaai's original appends literal
        # zeros); the reference feeds a randomly-initialized Linear there
        # instead, which scrambles the init warp (measured: rectified
        # output decorrelates from the source, corr -0.1 vs 0.68 for the
        # intended RARE Fig-6a init) and CTC never escapes the all-blank
        # plateau.  Zero init keeps the learned tail but starts exact.
        ex = nn.Dense(
            6,
            kernel_init=nn.initializers.zeros,
            dtype=jnp.float32, param_dtype=jnp.float32, name="fc",
        )(batch_C_prime.reshape(n, F * 2)).reshape(n, 3, 2)
        C_prime_with_zeros = jnp.concatenate([batch_C_prime, ex], axis=1)  # (N,F+3,2)
        T = jnp.einsum("ij,njk->nik", inv_delta_C, C_prime_with_zeros)
        P_prime = jnp.einsum("pj,njk->npk", P_hat, T)  # (N, h*w, 2)
        grid = P_prime.reshape(n, h, w, 2)
        return grid_sample_bilinear(x, grid).astype(x.dtype)
