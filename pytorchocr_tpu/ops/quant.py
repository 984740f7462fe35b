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
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["mode", "quantized", "calibrate", "quant_jit", "QuantConv"]

_MODE = None


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
        in_features = x.shape[-1]
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
            if self.is_mutable_collection("quant"):
                absmax.value = jnp.maximum(
                    absmax.value, jnp.max(jnp.abs(x)).astype(jnp.float32)
                )
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), **conv_kwargs
            )
        else:  # int8
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


def calibrate(model, variables, batches, **apply_kwargs):
    """Run a calibration pass and return variables extended with the
    ``quant`` collection of per-conv activation scales.

    ``batches``: iterable of model inputs (images).  Running absmax
    accumulates across batches.
    """
    apply_kwargs.setdefault("train", False)

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
