"""Post-training int8 quantization (PTQ) for inference.

TPU-native replacement for the reference's TensorRT low-precision engine
path (reference deploy/onnx2trt.ipynb builds TRT engines; TRT's int8 mode
needs a calibration pass — same idea here, without leaving JAX):

  * weights: per-output-channel symmetric int8, quantized from the f32
    master weights at trace time (cheap — weight tensors are tiny next to
    activations, and XLA folds the requantization into the executable);
  * activations: per-tensor symmetric int8 with scales measured by a
    calibration pass over representative data (running absmax, stored in a
    flax ``quant`` variable collection alongside params/batch_stats);
  * conv compute: int8 x int8 -> int32 on the MXU via
    ``lax.conv_general_dilated(..., preferred_element_type=int32)``.
    v5e executes int8 convs at ~2x the bf16 rate (394 vs 197 peak TOPS),
    measured 333 TOP/s vs 184 TF/s on this chip for a ResNet-scale conv.

Modes (module-level, read at trace time — each mode is its own jit trace):
  None         normal float path (default)
  "calibrate"  float compute + record per-conv activation absmax into the
               mutable ``quant`` collection
  "int8"       quantized compute using the calibrated scales

Usage:
    variables = quant.calibrate(model, variables, [batch1, batch2, ...])
    with quant.quantized():
        y = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)

Only ``ConvBNAct`` convs take the quantized path (they carry ~all det-model
FLOPs); deconvs, SE 1x1s and dense layers stay in the float dtype.  BN and
activations run in float after dequantization — XLA fuses them into the
conv epilogue as usual.
"""

import contextlib
import functools
from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "mode", "quantized", "calibrate", "quant_jit", "QuantConv",
    "QTensor", "dequant", "qadd_act", "qmaxpool",
]

_MODE = None

# int8-activation-flow feature gates (trace-time, like the mode): each q8
# region can be disabled independently — used for perf bisection and as a
# safety valve if a lowering regresses on some compiler version.
FLAGS = {
    "q8_backbone": True,
    # measured on v5e @736x1280 bs128 (see benchmarks/ROOFLINE.md):
    # int8-flowing the FPN top-down adds REGRESSES (887 vs 1176 imgs/s —
    # the dequant-add-requant chains break conv/add fusion at the small
    # pyramid levels), so it ships off; the fuse-concat and head flows win.
    "q8_fpn_topdown": False,
    "q8_fpn_fuse": True,
    "q8_head": True,
}


def flag(name):
    import os

    env = os.environ.get("OCR_TPU_" + name.upper())
    if env is not None:
        return env not in ("0", "false", "False")
    return FLAGS[name]


def mode():
    """Current quantization mode: None | "calibrate" | "int8"."""
    return _MODE


@contextlib.contextmanager
def quantized(m: str = "int8"):
    """Context manager selecting the quantization mode for traces/applies
    performed inside it."""
    global _MODE
    prev = _MODE
    _MODE = m
    try:
        yield
    finally:
        _MODE = prev


def quant_jit(fn, **jit_kwargs):
    """Mode-aware ``jax.jit``: the current quantization mode becomes part of
    the jit cache key, so each mode gets its own trace.

    Plain ``jax.jit`` does NOT key on the module-level mode (it is read at
    trace time only), so a function traced outside ``quantized()`` silently
    reuses the float trace when later called inside it.  Wrap deploy-path
    forwards with this instead of juggling separate jit objects per mode.
    """

    @functools.partial(jax.jit, static_argnums=0, **jit_kwargs)
    def _inner(m, *args):
        # tracing happens inside the jit call, under the requested mode; the
        # static arg keys the cache so each mode traces exactly once per shape
        with quantized(m):
            return fn(*args)

    def wrapper(*args):
        return _inner(_MODE, *args)

    return wrapper


def _symmetric_qparams(absmax, eps=1e-6):
    return jnp.maximum(absmax.astype(jnp.float32), eps) / 127.0


def _quantize(x, scale):
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )


class QTensor(NamedTuple):
    """int8 activation + its per-tensor symmetric scale (value = q * scale).

    The int8-activation-flow optimization: the headline det path is
    HBM-bandwidth-bound on the bf16 activations BETWEEN convs (measured:
    int8 convs alone gain only ~17% over bf16 at 736x1280 because every
    QuantConv dequantized to bf16 for HBM and the next conv re-quantized).
    Producer-side quantization stores the tensor as int8 — halving
    activation traffic — and the consumer conv takes (q, scale) directly.
    """

    q: jnp.ndarray      # int8 payload
    scale: jnp.ndarray  # () f32


def dequant(x, dtype=jnp.float32):
    """QTensor -> float array (identity on plain arrays)."""
    if isinstance(x, QTensor):
        return (x.q.astype(jnp.float32) * x.scale).astype(dtype)
    return x


def qtensor_from(x, absmax):
    """Quantize a float activation into a QTensor with a calibrated absmax."""
    scale = _symmetric_qparams(absmax)
    return QTensor(_quantize(x, scale), scale)


def qadd_act(a, b, absmax, act=None):
    """Residual add (+ optional activation) in the int8 domain.

    Inputs are read from HBM as int8 (the whole point), dequantized inside
    the fused elementwise kernel, added, activated, and requantized with
    the calibrated output absmax.  Returns a QTensor.
    """
    out = dequant(a) + dequant(b)
    if act is not None:
        out = act(out)
    return qtensor_from(out, absmax)


def repeat_nearest(q, scale):
    """Nearest-neighbor upsample of an int8 payload on NHWC via repeat
    (each output pixel copies exactly one input pixel — no accumulation, so
    the payload stays int8 and the op is pure halved-bandwidth traffic)."""
    return jnp.repeat(jnp.repeat(q, scale, axis=1), scale, axis=2)


def qmaxpool(x: QTensor, window, stride, padding):
    """Max-pool directly on the int8 payload (max commutes with the
    positive per-tensor scale), keeping the pooled tensor int8 in HBM."""
    q = jax.lax.reduce_window(
        x.q,
        jnp.int8(-128),
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )
    return QTensor(q, x.scale)


class QuantConv(nn.Module):
    """Drop-in conv used by ``ConvBNAct`` under a quantization mode.

    Declares ``kernel``/``bias`` params with exactly the shapes and names
    ``nn.Conv`` uses, so float checkpoints restore unchanged, plus an
    ``act_absmax`` scalar in the ``quant`` collection.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    padding: Any
    feature_group_count: int = 1
    kernel_dilation: Sequence[int] = (1, 1)
    use_bias: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Any = jnp.float32
    qmode: str = "calibrate"

    @nn.compact
    def __call__(self, x):
        in_features = (x.q if isinstance(x, QTensor) else x).shape[-1]
        kshape = tuple(self.kernel_size) + (
            in_features // self.feature_group_count,
            self.features,
        )
        kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        absmax = self.variable(
            "quant", "act_absmax", lambda: jnp.zeros((), jnp.float32)
        )

        conv_kwargs = dict(
            window_strides=tuple(self.strides),
            padding=self.padding,
            rhs_dilation=tuple(self.kernel_dilation),
            feature_group_count=self.feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

        if self.qmode == "calibrate":
            x = dequant(x)
            if self.is_mutable_collection("quant"):
                absmax.value = jnp.maximum(
                    absmax.value, jnp.max(jnp.abs(x)).astype(jnp.float32)
                )
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), **conv_kwargs
            )
        else:  # int8
            if isinstance(x, QTensor):
                # producer already quantized (int8 activation flow): use the
                # incoming payload + scale, skip this conv's input absmax
                s_x, xq = x.scale, x.q
            else:
                s_x = _symmetric_qparams(absmax.value)
                xq = _quantize(x, s_x)
            s_w = _symmetric_qparams(
                jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
            )  # per-output-channel
            wq = _quantize(kernel, s_w[None, None, None, :])
            y = jax.lax.conv_general_dilated(
                xq, wq, preferred_element_type=jnp.int32, **conv_kwargs
            )
            y = y.astype(jnp.float32) * (s_x * s_w)[None, None, None, :]

        if bias is not None:
            y = y.astype(jnp.float32) + bias
        return y.astype(self.dtype)


class QuantConvTranspose(nn.Module):
    """int8 PTQ twin of ``nn.ConvTranspose`` (param tree identical: kernel
    (kh, kw, in, out) + bias, so float checkpoints restore unchanged).
    Same scheme as QuantConv: calibrated per-tensor input scale (or an
    incoming QTensor's), per-output-channel weight scales, int8 x int8 ->
    int32 on the MXU.

    NOT used by the production DBHead: the int8 deconv lowering measured
    SLOWER end to end than bf16 deconv compute with int8 IO (535s loop
    compile, 925 vs 1176 imgs/s — benchmarks/ROOFLINE.md negative
    results).  Kept, with its parity test, as the documented negative
    result and for configs that want it explicitly."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Any = jnp.float32
    qmode: str = "calibrate"

    @nn.compact
    def __call__(self, x):
        in_features = (x.q if isinstance(x, QTensor) else x).shape[-1]
        kshape = tuple(self.kernel_size) + (in_features, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        absmax = self.variable(
            "quant", "act_absmax", lambda: jnp.zeros((), jnp.float32)
        )
        kh, kw = self.kernel_size
        sh, sw = self.strides
        # kernel_size == strides (the DBHead 2x2/s2 towers): each input
        # pixel produces exactly one kh x kw output block, so the transposed
        # conv is EXACTLY a 1x1 conv to (kh*kw*out) + depth-to-space — a
        # plain MXU matmul instead of lax.conv_transpose, with the SAME
        # stored (kh, kw, in, out) params reshaped at trace time.
        assert (kh, kw) == (sh, sw), (
            "QuantConvTranspose currently supports kernel_size == strides"
        )
        # (kh, kw, in, out) -> (1, 1, in, kh*kw*out). lax.conv_transpose
        # (and hence nn.ConvTranspose) applies the spatially-FLIPPED kernel
        # in the block mapping, so flip before reshaping (parity-tested
        # against nn.ConvTranspose in tests/test_quant.py).
        k1x1 = jnp.transpose(kernel[::-1, ::-1], (2, 0, 1, 3)).reshape(
            1, 1, in_features, kh * kw * self.features
        )

        def depth_to_space(y):
            n, h, w, _ = y.shape
            y = y.reshape(n, h, w, kh, kw, self.features)
            y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
            return y.reshape(n, h * kh, w * kw, self.features)

        kwargs = dict(
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.qmode == "calibrate":
            x = dequant(x)
            if self.is_mutable_collection("quant"):
                absmax.value = jnp.maximum(
                    absmax.value, jnp.max(jnp.abs(x)).astype(jnp.float32)
                )
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), k1x1.astype(self.dtype), **kwargs
            )
            y = depth_to_space(y)
        else:  # int8
            if isinstance(x, QTensor):
                s_x, xq = x.scale, x.q
            else:
                s_x = _symmetric_qparams(absmax.value)
                xq = _quantize(x, s_x)
            s_w = _symmetric_qparams(jnp.max(jnp.abs(k1x1), axis=(0, 1, 2)))
            wq = _quantize(k1x1, s_w[None, None, None, :])
            y = jax.lax.conv_general_dilated(
                xq, wq, preferred_element_type=jnp.int32, **kwargs
            )
            # dequantize in the compute dtype: the depth-to-space transpose
            # materializes this tensor (XLA cannot fuse across it), and an
            # f32 temp at bs128x184x320x256 is 7.2 GB — bf16 halves it; the
            # ~0.4% bf16 rounding is far below the int8 quantization error
            y = y.astype(self.dtype) * (s_x * s_w).astype(self.dtype)[
                None, None, None, :
            ]
            y = depth_to_space(y)
        if bias is not None:
            y = y.astype(self.dtype) + bias.astype(self.dtype)
        return y.astype(self.dtype)


def calibrate(model, variables, batches, **apply_kwargs):
    """Run a calibration pass and return variables extended with the
    ``quant`` collection of per-conv activation scales.

    ``batches``: iterable of model inputs (images).  Running absmax
    accumulates across batches.
    """
    apply_kwargs.setdefault("train", False)

    import jax

    # jit the calibration forward: eager flax apply dispatches every op
    # separately (ruinous through a ~30ms-RTT device tunnel); one traced
    # call also lands in the persistent compile cache.
    @jax.jit
    def _step(vs, images):
        _, mut = model.apply(vs, images, mutable=["quant"], **apply_kwargs)
        return mut["quant"]

    qvars = variables.get("quant", None)
    for images in batches:
        vs = dict(variables)
        if qvars is not None:
            vs["quant"] = qvars
        with quantized("calibrate"):
            qvars = _step(vs, images)
    if qvars is None:
        raise ValueError("calibrate() needs at least one batch")
    out = dict(variables)
    out["quant"] = qvars
    return out
