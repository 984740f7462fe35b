"""ConvNeXt det backbone (reference pytocr/modeling/backbones/det_convnext.py),
NHWC flax: patchify stem, depthwise 7x7 + LN + MLP blocks with layer scale
and stochastic depth; per-stage LN on the output taps."""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ConvNeXt"]

_SPECS = {
    "tiny": ([3, 3, 9, 3], [96, 192, 384, 768]),
    "small": ([3, 3, 27, 3], [96, 192, 384, 768]),
    "base": ([3, 3, 27, 3], [192, 384, 768, 1536]),
}


class _Block(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init_value: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        x = nn.Conv(
            self.dim, (7, 7), padding=[(3, 3), (3, 3)], feature_group_count=self.dim,
            dtype=self.dtype, param_dtype=jnp.float32, name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pwconv1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,),
                jnp.float32,
            )
            x = x * gamma
        if self.drop_path > 0.0 and train:
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
            x = x * mask / keep
        return inputs + x


class ConvNeXt(nn.Module):
    in_channels: int = 3
    model_name: str = "tiny"
    drop_path_rate: float = 0.4
    layer_scale_init_value: float = 1.0
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> Sequence[int]:
        return list(_SPECS[self.model_name][1])

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.model_name in _SPECS, "model_name must be in %s" % list(_SPECS)
        depths, dims = _SPECS[self.model_name]
        dp_rates = [
            float(r) for r in jnp.linspace(0, self.drop_path_rate, sum(depths))
        ]
        outs = []
        cur = 0
        for i in range(4):
            if i == 0:
                x = nn.Conv(dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                            param_dtype=jnp.float32, name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="down%d_norm" % i)(x)
                x = nn.Conv(dims[i], (2, 2), strides=(2, 2), dtype=self.dtype,
                            param_dtype=jnp.float32, name="down%d_conv" % i)(x)
            for j in range(depths[i]):
                x = _Block(
                    dims[i],
                    drop_path=dp_rates[cur + j],
                    layer_scale_init_value=self.layer_scale_init_value,
                    dtype=self.dtype,
                    name="stage%d_block%d" % (i, j),
                )(x, train)
            cur += depths[i]
            x_out = nn.LayerNorm(
                epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                name="out_norm%d" % i,
            )(x)
            outs.append(x_out)
        return outs
