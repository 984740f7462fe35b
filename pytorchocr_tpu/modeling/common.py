"""Shared model blocks (reference pytocr/modeling/utils.py:5-127).

flax.linen, NHWC, bf16-friendly: every block takes `dtype` (compute dtype)
and keeps parameters in float32 (`param_dtype`), the standard TPU mixed-
precision recipe — bf16 matmul/conv inputs hit the MXU at full rate while
master weights and BN statistics stay in f32.
"""

from typing import Any, Callable, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ..ops import quant as quant_ops

# torch-style kaiming_normal(fan_out) for convs (reference inits)
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


ACTS = {
    "relu": nn.relu,
    "relu6": nn.relu6,
    "hardswish": hard_swish,
    "hard_swish": hard_swish,
    "hsigmoid": hard_sigmoid,
    "hardsigmoid": hard_sigmoid,
    "leakyrelu": lambda x: nn.leaky_relu(x, 0.01),
    "leakyrelu0.2": lambda x: nn.leaky_relu(x, 0.2),
    "gelu": nn.gelu,
    "swish": nn.swish,
    "sigmoid": nn.sigmoid,
}


class ConvBNAct(nn.Module):
    """conv -> BN -> activation. NHWC."""

    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    padding: Any = None  # None -> torch-style symmetric padding ks//2
    groups: int = 1
    dilation: int = 1
    use_bias: bool = False
    act: Optional[str] = "relu"
    use_bn: bool = True
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9
    dtype: Any = jnp.float32
    # int8 activation flow (ops/quant.py:QTensor): under int8 PTQ, quantize
    # the post-BN/act output with a calibrated absmax and return a QTensor,
    # so the tensor crosses HBM as int8 (half the bandwidth of bf16). Set
    # at call sites whose consumers are themselves quantized convs/adds.
    emit_q: bool = False
    q_region: str = "q8_backbone"  # feature gate (ops/quant.py:FLAGS)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = (
            (self.kernel_size, self.kernel_size)
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size)
        )
        st = (self.stride, self.stride) if isinstance(self.stride, int) else tuple(self.stride)
        if self.padding is None:
            pad = [(d * (k - 1) // 2, d * (k - 1) // 2) for k, d in zip(ks, (self.dilation, self.dilation))]
        elif isinstance(self.padding, int):
            pad = [(self.padding, self.padding)] * 2
        else:
            pad = self.padding
        qmode = quant_ops.mode()
        quantized = qmode is not None and not train
        if not quantized:
            x = quant_ops.dequant(x, self.dtype)  # defensive: q8 flow is PTQ-only
        if quantized:
            # int8 PTQ path (ops/quant.py): same param tree as nn.Conv, conv
            # runs int8 x int8 -> int32 on the MXU with calibrated scales
            x = quant_ops.QuantConv(
                features=self.out_channels,
                kernel_size=ks,
                strides=st,
                padding=pad,
                feature_group_count=self.groups,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=self.use_bias,
                kernel_init=kaiming_normal,
                dtype=self.dtype,
                qmode=qmode,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                features=self.out_channels,
                kernel_size=ks,
                strides=st,
                padding=pad,
                feature_group_count=self.groups,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=self.use_bias,
                kernel_init=kaiming_normal,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="bn",
            )(x)
        if self.act is not None:
            x = ACTS[self.act](x)
        if self.emit_q and quantized and quant_ops.flag(self.q_region):
            out_absmax = self.variable(
                "quant", "out_absmax", lambda: jnp.zeros((), jnp.float32)
            )
            if qmode == "calibrate":
                if self.is_mutable_collection("quant"):
                    out_absmax.value = jnp.maximum(
                        out_absmax.value,
                        jnp.max(jnp.abs(x)).astype(jnp.float32),
                    )
            else:  # int8: producer-side quantization -> int8 in HBM
                return quant_ops.qtensor_from(x, out_absmax.value)
        return x


def finish_residual(mod, out, identity, dtype, act_fn, train=False):
    """Residual-add + activation tail shared by ResNet-style blocks, with
    the int8-activation-flow fast path under PTQ (ops/quant.py):

      * int8 mode: both operands are read from HBM as int8 QTensors, the
        fused add/act requantizes with the block's calibrated out_absmax,
        and the block output stays int8 in HBM;
      * calibrate mode: float math + record the block-output absmax;
      * float/training: plain `act(out + identity)`.
    """
    qmode = quant_ops.mode()
    quantized = (qmode is not None and not train
                 and quant_ops.flag("q8_backbone"))
    if quantized:
        absmax = mod.variable(
            "quant", "out_absmax", lambda: jnp.zeros((), jnp.float32)
        )
        if qmode == "int8":
            return quant_ops.qadd_act(out, identity, absmax.value, act=act_fn)
    y = act_fn(quant_ops.dequant(out, dtype) + quant_ops.dequant(identity, dtype))
    if quantized and qmode == "calibrate" and mod.is_mutable_collection("quant"):
        absmax.value = jnp.maximum(
            absmax.value, jnp.max(jnp.abs(y)).astype(jnp.float32)
        )
    return y


def quant_max_pool(x, window, stride, padding):
    """max_pool that keeps an int8 QTensor int8 (max commutes with the
    positive scale); plain arrays take the normal max_pool."""
    if isinstance(x, quant_ops.QTensor):
        return quant_ops.qmaxpool(x, window, stride, padding)
    return max_pool(x, window, stride, padding)


class SEModule(nn.Module):
    """Squeeze-excitation (reference modeling/utils.py SEModule)."""

    channels: int
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(
            self.channels // self.reduction,
            (1, 1),
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc1",
        )(s)
        s = nn.relu(s)
        s = nn.Conv(
            self.channels,
            (1, 1),
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc2",
        )(s)
        s = hard_sigmoid(s)
        return x * s


class DPModule(nn.Module):
    """Depthwise + pointwise conv block (reference modeling/utils.py DPModule)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    act: str = "leakyrelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = ConvBNAct(
            in_ch,
            self.kernel_size,
            self.stride,
            groups=in_ch,
            act=self.act,
            dtype=self.dtype,
            name="dw",
        )(x, train)
        x = ConvBNAct(
            self.out_channels,
            1,
            1,
            act=self.act,
            dtype=self.dtype,
            name="pw",
        )(x, train)
        return x


def max_pool(x, window, strides, padding=(0, 0)):
    """torch-style MaxPool2d on NHWC: explicit symmetric padding with -inf."""
    if isinstance(window, int):
        window = (window, window)
    if isinstance(strides, int):
        strides = (strides, strides)
    if isinstance(padding, int):
        padding = (padding, padding)
    pads = ((padding[0], padding[0]), (padding[1], padding[1]))
    return nn.max_pool(x, window, strides=strides, padding=pads)


def resize_nearest(x, scale):
    """Nearest-neighbor upsample by integer scale on NHWC.

    Implemented as a depthwise transposed conv (input-dilated conv with an
    all-ones s x s kernel): each output pixel is produced by exactly one
    nonzero tap, so the result is elementwise-exact nearest upsampling, and
    the output is written ONCE by the conv — measured 8.7ms vs 43ms for the
    repeat/broadcast+reshape lowering on the FPN C3->C2 hotspot (bs128
    92x160x256 -> 184x320x256, v5e), which also removes the giant
    broadcast_in_dim HLO temps that capped the inference batch size.

    precision=HIGHEST keeps the f32 path exact (bf16x3 decomposition; no-op
    for bf16 inputs).  Gradient is the adjoint strided conv — safe in
    training.
    """
    import jax

    n, h, w, c = x.shape
    s = int(scale)
    if s == 1:
        return x
    kernel = jnp.ones((s, s, 1, c), x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(s - 1, s - 1), (s - 1, s - 1)],
        lhs_dilation=(s, s),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
