"""DB head (reference pytocr/modeling/heads/det_db_head.py).

Two conv + 2x deconv towers producing full-resolution probability and
threshold maps; train-time differentiable binarization
1/(1+exp(-k(P-T))), k=50.  Output is NHWC: {"maps": (N, H, W, 3)} at train,
{"maps": (N, H, W, 1)} (prob only) at eval.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import quant as quant_ops
from ..common import ConvBNAct, kaiming_normal

__all__ = ["DBHead"]


def _upconv2x(x, features, dtype, name, train=False):
    """2x2-stride-2 transposed conv (int8-PTQ-aware: same param tree).

    NOTE: a 1x1-conv-to-4C + depth-to-space formulation is mathematically
    the same function class and ~9% faster on v5e, but measurably degrades
    optimization on this head (overfit experiments plateau at 2x the loss)
    — likely an initialization/conditioning effect — so the deconv
    parameterization is kept."""
    # Under the q8 head flow the deconv COMPUTE stays bf16 (int8 lowering of
    # the transposed conv measured pathological on v5e: 535s loop compile
    # and a throughput REGRESSION), but its input arrives as an int8
    # QTensor: the dequant fuses into the conv read, so the HBM traffic win
    # of the producer-side quantization is kept.
    x = quant_ops.dequant(x, dtype)
    return nn.ConvTranspose(
        features, (2, 2), strides=(2, 2), use_bias=True,
        kernel_init=kaiming_normal, dtype=dtype, param_dtype=jnp.float32,
        name=name,
    )(x)


class _Tower(nn.Module):
    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # int8 activation flow under PTQ: conv1 and the bn2/relu emission
        # keep the half- and quarter-res tower activations int8 in HBM.
        # Deconv COMPUTE stays bf16 (nn.ConvTranspose) — the int8 deconv
        # lowering measured slower end to end (benchmarks/ROOFLINE.md
        # negative results); only its IO tensors ride HBM as int8.
        c = self.in_channels // 4
        x = ConvBNAct(c, 3, 1, act="relu", dtype=self.dtype, emit_q=True,
                      q_region="q8_head", name="conv1")(x, train)
        x = _upconv2x(x, c, self.dtype, "deconv1", train)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name="bn2",
        )(x)
        x = nn.relu(x)
        qmode = quant_ops.mode()
        if qmode is not None and not train and quant_ops.flag("q8_head"):
            mid_absmax = self.variable(
                "quant", "mid_absmax", lambda: jnp.zeros((), jnp.float32)
            )
            if qmode == "calibrate":
                if self.is_mutable_collection("quant"):
                    mid_absmax.value = jnp.maximum(
                        mid_absmax.value, jnp.max(jnp.abs(x)).astype(jnp.float32)
                    )
            else:
                x = quant_ops.qtensor_from(x, mid_absmax.value)
        x = _upconv2x(x, 1, self.dtype, "deconv2", train)
        return nn.sigmoid(x.astype(jnp.float32))


class DBHead(nn.Module):
    in_channels: int
    k: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, targets=None, train: bool = False):
        shrink_maps = _Tower(self.in_channels, dtype=self.dtype, name="binarize")(
            x, train
        )
        if not train:
            return {"maps": shrink_maps}
        threshold_maps = _Tower(self.in_channels, dtype=self.dtype, name="thresh")(
            x, train
        )
        binary_maps = jax.nn.sigmoid(self.k * (shrink_maps - threshold_maps))
        y = jnp.concatenate([shrink_maps, threshold_maps, binary_maps], axis=-1)
        return {"maps": y}
