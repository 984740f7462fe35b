"""Adaptive Scale Fusion (DB++ ASF) attention (reference pytocr/modeling/necks/asf.py).

NHWC; the per-level reweighting (score[..., i:i+1] * level_i) and the three
attention variants match the reference.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import kaiming_normal

__all__ = ["ScaleFeatureSelection"]


def _conv(features, k, name, use_bias=False, dtype=jnp.float32):
    return nn.Conv(
        features,
        (k, k),
        padding=[(k // 2, k // 2)] * 2,
        use_bias=use_bias,
        kernel_init=kaiming_normal,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class ScaleChannelAttention(nn.Module):
    mid_channels: int
    num_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = _conv(self.mid_channels, 1, "fc1", dtype=self.dtype)(g)
        g = nn.relu(
            nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="bn",
            )(g)
        )
        g = _conv(self.num_features, 1, "fc2", dtype=self.dtype)(g)
        return nn.softmax(g, axis=-1)


class ScaleChannelSpatialAttention(nn.Module):
    in_channels: int
    mid_channels: int
    num_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = _conv(self.mid_channels, 1, "cw1", dtype=self.dtype)(g)
        g = nn.relu(g)
        g = _conv(self.in_channels, 1, "cw2", dtype=self.dtype)(g)
        channel_atten = nn.sigmoid(g)
        global_x = channel_atten + x
        m = jnp.mean(global_x, axis=-1, keepdims=True)
        s = _conv(1, 3, "sw1", dtype=self.dtype)(m)
        s = nn.relu(s)
        s = nn.sigmoid(_conv(1, 1, "sw2", dtype=self.dtype)(s))
        global_x = s + global_x
        return nn.sigmoid(_conv(self.num_features, 1, "aw", dtype=self.dtype)(global_x))


class ScaleSpatialAttention(nn.Module):
    num_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = jnp.mean(x, axis=-1, keepdims=True)
        s = _conv(1, 3, "sw1", dtype=self.dtype)(m)
        s = nn.relu(s)
        s = nn.sigmoid(_conv(1, 1, "sw2", dtype=self.dtype)(s))
        global_x = s + x
        return nn.sigmoid(nn.Conv(
            self.num_features, (1, 1), use_bias=False, kernel_init=kaiming_normal,
            dtype=self.dtype, param_dtype=jnp.float32, name="aw",
        )(global_x))


class ScaleFeatureSelection(nn.Module):
    in_channels: int
    inter_channels: int
    out_features_num: int = 4
    attention_type: str = "scale_spatial"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, concat_x, features_list, train: bool = False):
        concat_x = nn.Conv(
            self.inter_channels,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            kernel_init=kaiming_normal,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(concat_x)
        if self.attention_type == "scale_spatial":
            score = ScaleSpatialAttention(
                self.out_features_num, dtype=self.dtype, name="att"
            )(concat_x, train)
        elif self.attention_type == "scale_channel_spatial":
            score = ScaleChannelSpatialAttention(
                self.inter_channels,
                self.inter_channels // 4,
                self.out_features_num,
                dtype=self.dtype,
                name="att",
            )(concat_x, train)
        elif self.attention_type == "scale_channel":
            score = ScaleChannelAttention(
                self.inter_channels // 2,
                self.out_features_num,
                dtype=self.dtype,
                name="att",
            )(concat_x, train)
        else:
            raise ValueError("unknown attention_type %s" % self.attention_type)

        assert len(features_list) == self.out_features_num
        if self.attention_type == "scale_channel":
            # N,1,1,F -> broadcast over H, W
            score = jnp.broadcast_to(
                score,
                (score.shape[0],) + features_list[0].shape[1:3] + (score.shape[-1],),
            )
        outs = [
            score[..., i : i + 1] * features_list[i]
            for i in range(self.out_features_num)
        ]
        return jnp.concatenate(outs, axis=-1)
