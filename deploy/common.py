"""Shared deploy runtime: checkpoint loading + jitted/AOT executables.

Replaces the reference's TensorRT engine layer (deploy/common.py,
deploy/trt_utils.py): instead of ONNX export + TRT engines + a pycuda
normalize kernel, inference runs one jitted XLA executable per input-shape
bucket; `aot_compile` lowers and compiles ahead of time, and
`export_serialized` emits a portable serialized executable via jax.export.
The fused uint8->normalized-float preprocessing (the reference's custom CUDA
kernel, trt_utils.py:33-60) is part of the jitted graph here — XLA fuses it.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from pytorchocr_tpu.modeling import build_model
from pytorchocr_tpu.utils.save_load import _restore_pytree


def load_variables(ckpt_path):
    """Load {params, batch_stats} from an orbax checkpoint directory."""
    restored = _restore_pytree(os.path.abspath(ckpt_path))
    variables = {"params": restored["params"]}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]
    return variables


def build_infer_model(config, dtype=jnp.bfloat16):
    """Architecture -> eval-mode model (bf16 compute by default on TPU)."""
    return build_model(config["Architecture"], dtype=dtype)


def _dp_mesh():
    """1-D ("data",) mesh over all local devices, or None on one device.

    Serving scale-out: the reference serves one GPU per process (TRT engine
    bound to a device, deploy/common.py); here a single process drives every
    local TPU chip by sharding the batch axis — XLA splits the work, no
    collectives are needed in a pure forward.  Disable with
    OCR_TPU_DEPLOY_DP=0 (e.g. to pin a chip per process instead).
    """
    if os.environ.get("OCR_TPU_DEPLOY_DP", "1") == "0":
        return None
    devices = jax.local_devices()
    if len(devices) < 2:
        return None
    from jax.sharding import Mesh

    return Mesh(np.array(devices), ("data",))


class JitRunner:
    """Per-shape-cached jitted forward with optional fused normalization.

    mean/std are folded into the graph so the host passes raw uint8/float
    HWC images (the device does /255, -mean, /std — a few fused VPU ops).

    On hosts with multiple accelerator chips the batch axis is sharded over
    a ("data",) mesh automatically (see _dp_mesh); batches are padded to a
    device-count multiple and results sliced back.
    """

    def __init__(
        self, model, variables, mean=None, std=None, scale=1.0 / 255.0, quant=False
    ):
        self.model = model
        self.variables = variables
        self.quant = quant
        if mean is not None:
            self.mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, -1)
            self.std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, -1)
        else:
            self.mean = None
            self.std = None
        self.scale = scale

        def forward(variables, images):
            x = images.astype(jnp.float32)
            if self.mean is not None:
                x = (x * self.scale - self.mean) / self.std
            return self.model.apply(variables, x, train=False)

        from pytorchocr_tpu.ops import quant as quant_ops

        self._forward = forward
        self.mesh = _dp_mesh()
        jit_kwargs = {}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            replicated = NamedSharding(self.mesh, PartitionSpec())
            batched = NamedSharding(self.mesh, PartitionSpec("data"))
            jit_kwargs = dict(
                in_shardings=(replicated, batched), out_shardings=batched
            )
        # mode-aware jit: the quantization mode is part of the cache key, so
        # float and int8 traces can never be confused (ops/quant.py:quant_jit)
        self._jitted = quant_ops.quant_jit(forward, **jit_kwargs)

    def _normalize(self, images):
        x = jnp.asarray(images).astype(jnp.float32)
        if self.mean is not None:
            x = (x * self.scale - self.mean) / self.std
        return x

    def calibrate(self, batches):
        """int8 PTQ calibration (replaces the TRT-int8 calibrator): record
        per-conv activation scales over representative raw input batches."""
        from pytorchocr_tpu.ops import quant as quant_ops

        self.variables = quant_ops.calibrate(
            self.model, self.variables, [self._normalize(b) for b in batches]
        )
        self.quant = True

    def __call__(self, images):
        images = jnp.asarray(images)
        n = images.shape[0]
        if self.mesh is not None:
            pad = (-n) % self.mesh.size
            if pad:
                images = jnp.concatenate(
                    [images, jnp.repeat(images[:1], pad, axis=0)], axis=0
                )
        if self.quant:
            from pytorchocr_tpu.ops import quant as quant_ops

            if "quant" not in self.variables:
                raise ValueError("quant=True requires calibrate() first")
            with quant_ops.quantized("int8"):
                out = self._jitted(self.variables, images)
        else:
            out = self._jitted(self.variables, images)
        if self.mesh is not None and images.shape[0] != n:
            out = jax.tree.map(lambda a: a[:n], out)
        return out


def padded_pow2_batch(arrays, combine=np.stack):
    """Pad a list of per-sample arrays to the next power-of-two count by
    repeating the first element, then combine along axis 0.  Returns
    (batch, n_real); callers slice results back to n_real.

    Power-of-two bucketing keeps arbitrary request sizes on a handful of
    compiled graphs (a fresh batch-size compile through the TPU tunnel
    costs ~6s) and avoids XLA's poor tiling of off-pow2 batch axes
    (benchmarks/ROOFLINE.md).  Single source of the policy for the det /
    cls / rec deploy stages."""
    n = len(arrays)
    bs = 1 << (n - 1).bit_length()
    return combine(list(arrays) + [arrays[0]] * (bs - n), axis=0), n


def aot_compile(fn, *example_args):
    """AOT lower+compile an executable for fixed shapes (replaces the
    reference's onnx2trt notebook flow)."""
    return jax.jit(fn).lower(*example_args).compile()


def export_serialized(fn, *example_args):
    """Serialize a compiled function with jax.export (portable artifact,
    replaces .onnx/.trt files).  Returns bytes."""
    from jax import export as jax_export

    exported = jax_export.export(jax.jit(fn))(*example_args)
    return exported.serialize()


def load_serialized(blob):
    from jax import export as jax_export

    return jax_export.deserialize(blob).call
