"""RepVGG det backbone (reference pytocr/modeling/backbones/det_repvgg.py),
NHWC flax.

Train mode: 3-branch blocks (3x3+BN, 1x1+BN, identity-BN).  Deploy mode:
single reparameterized 3x3 conv.  `reparameterize_params` converts trained
params into deploy params functionally (the torch version mutates modules in
place via switch_to_deploy; here it is a pure params->params transform).
"""

from typing import Any, Dict, Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBNAct, kaiming_normal

__all__ = ["RepVGG", "reparameterize_params"]

_OPTIONAL_GROUPWISE = [2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26]


def _model_conf(model_name):
    g2 = {l: 2 for l in _OPTIONAL_GROUPWISE}
    g4 = {l: 4 for l in _OPTIONAL_GROUPWISE}
    if "A" in model_name:
        num_blocks = [2, 4, 14, 1]
    elif "B" in model_name:
        num_blocks = [4, 6, 16, 1]
    elif "D" in model_name:
        num_blocks = [8, 14, 24, 1]
    else:
        raise ValueError(model_name)

    groups_map: Dict[int, int] = {}
    use_se = False
    if model_name == "A0":
        wm = [0.75, 0.75, 0.75, 2.5]
    elif model_name == "A1":
        wm = [1, 1, 1, 2.5]
    elif model_name == "A2":
        wm = [1.5, 1.5, 1.5, 2.75]
    elif model_name == "B0":
        wm = [1, 1, 1, 2.5]
    elif "B1" in model_name:
        wm = [2, 2, 2, 4]
        groups_map = g2 if model_name == "B1g2" else g4 if model_name == "B1g4" else {}
    elif "B2" in model_name:
        wm = [2.5, 2.5, 2.5, 5]
        groups_map = g2 if model_name == "B2g2" else g4 if model_name == "B2g4" else {}
    elif "B3" in model_name:
        wm = [3, 3, 3, 5]
        groups_map = g2 if model_name == "B3g2" else g4 if model_name == "B3g4" else {}
    elif model_name == "D2se":
        wm = [2.5, 2.5, 2.5, 5]
        use_se = True
    else:
        raise ValueError(model_name)
    return num_blocks, wm, groups_map, use_se


class _SEBlock(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels // 16, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="down")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="up")(s)
        return x * nn.sigmoid(s)


class RepVGGBlock(nn.Module):
    out_ch: int
    stride: int = 1
    groups: int = 1
    use_se: bool = False
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            out = nn.Conv(
                self.out_ch, (3, 3), strides=(self.stride, self.stride),
                padding=[(1, 1), (1, 1)], feature_group_count=self.groups,
                use_bias=True, kernel_init=kaiming_normal, dtype=self.dtype,
                param_dtype=jnp.float32, name="reparam",
            )(x)
        else:
            dense = ConvBNAct(
                self.out_ch, 3, self.stride, groups=self.groups, act=None,
                dtype=self.dtype, name="dense",
            )(x, train)
            one = ConvBNAct(
                self.out_ch, 1, self.stride, padding=0, groups=self.groups, act=None,
                dtype=self.dtype, name="one",
            )(x, train)
            out = dense + one
            if x.shape[-1] == self.out_ch and self.stride == 1:
                idbn = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, param_dtype=jnp.float32, name="idbn",
                )(x)
                out = out + idbn
        if self.use_se:
            out = _SEBlock(self.out_ch, dtype=self.dtype, name="se")(out)
        return nn.relu(out)


class RepVGG(nn.Module):
    in_channels: int = 3
    model_name: str = "A0"
    use_se: bool = False
    deploy: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> Sequence[int]:
        num_blocks, wm, _, _ = _model_conf(self.model_name)
        return [
            int(64 * wm[0]), int(128 * wm[1]), int(256 * wm[2]), int(512 * wm[3])
        ]

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_blocks, wm, groups_map, conf_se = _model_conf(self.model_name)
        use_se = self.use_se or conf_se
        in_planes = min(64, int(64 * wm[0]))

        x = RepVGGBlock(in_planes, 2, use_se=use_se, deploy=self.deploy,
                        dtype=self.dtype, name="stage0")(x, train)
        outs = []
        planes = [int(64 * wm[0]), int(128 * wm[1]), int(256 * wm[2]), int(512 * wm[3])]
        layer_idx = 1
        for si in range(4):
            for i in range(num_blocks[si]):
                s = 2 if i == 0 else 1
                g = groups_map.get(layer_idx, 1)
                x = RepVGGBlock(
                    planes[si], s, groups=g, use_se=use_se, deploy=self.deploy,
                    dtype=self.dtype, name="stage%d_%d" % (si + 1, i),
                )(x, train)
                layer_idx += 1
            outs.append(x)
        return outs


def _fuse_conv_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """Fold BN into a conv kernel (HWIO) -> (kernel', bias')."""
    std = np.sqrt(np.asarray(bn_var) + eps)
    t = np.asarray(bn_scale) / std  # (O,)
    return np.asarray(kernel) * t[None, None, None, :], np.asarray(bn_bias) - np.asarray(bn_mean) * t


def reparameterize_params(train_params, train_batch_stats):
    """Convert trained RepVGG block params into deploy params: for each
    block, the equivalent 3x3 kernel = fused(dense) + pad(fused(1x1)) +
    fused(identity-BN as identity kernel).  Returns a params pytree for the
    deploy=True module (reference switch_to_deploy, det_repvgg.py:136-153)."""

    def convert_block(bp, bs):
        k3, b3 = _fuse_conv_bn(
            bp["dense"]["conv"]["kernel"],
            bp["dense"]["bn"]["scale"], bp["dense"]["bn"]["bias"],
            bs["dense"]["bn"]["mean"], bs["dense"]["bn"]["var"],
        )
        k1, b1 = _fuse_conv_bn(
            bp["one"]["conv"]["kernel"],
            bp["one"]["bn"]["scale"], bp["one"]["bn"]["bias"],
            bs["one"]["bn"]["mean"], bs["one"]["bn"]["var"],
        )
        k1p = np.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
        kernel = k3 + k1p
        bias = b3 + b1
        if "idbn" in bp:
            in_dim = k3.shape[2]  # per-group input channels (HWIO)
            out_dim = k3.shape[3]
            id_kernel = np.zeros_like(np.asarray(k3))
            for o in range(out_dim):
                id_kernel[1, 1, o % in_dim, o] = 1.0
            kid, bid = _fuse_conv_bn(
                id_kernel,
                bp["idbn"]["scale"], bp["idbn"]["bias"],
                bs["idbn"]["mean"], bs["idbn"]["var"],
            )
            kernel = kernel + kid
            bias = bias + bid
        out = {"reparam": {"kernel": kernel, "bias": bias}}
        if "se" in bp:
            out["se"] = bp["se"]
        return out

    def walk(params, stats):
        if isinstance(params, dict) and "dense" in params and "one" in params:
            return convert_block(params, stats)
        out = {}
        for k, v in params.items():
            if isinstance(v, dict) and "dense" in v and "one" in v:
                out[k] = convert_block(v, stats.get(k, {}))
            elif isinstance(v, dict):
                out[k] = walk(v, stats.get(k, {}) if isinstance(stats, dict) else {})
            else:
                out[k] = v
        return out

    return walk(train_params, train_batch_stats)
