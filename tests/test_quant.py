"""int8 PTQ (ops/quant.py): calibration, checkpoint-compatible param tree,
accuracy vs the float path, and the JitRunner deploy integration.

TPU-native analogue of the reference's TensorRT-int8 engine option
(deploy/onnx2trt.ipynb); the reference has no tests for it — these define
the contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchocr_tpu.modeling import build_model
from pytorchocr_tpu.modeling.common import ConvBNAct
from pytorchocr_tpu.ops import quant


def _small_stack():
    import flax.linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = ConvBNAct(16, 3, 2, act="relu", name="c1")(x, train)
            x = ConvBNAct(32, 3, 1, act="relu", name="c2")(x, train)
            x = ConvBNAct(32, 1, 1, act=None, name="c3")(x, train)
            return x

    return Stack()


def test_calibrate_and_int8_close_to_float():
    model = _small_stack()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    calibrated = quant.calibrate(model, variables, [x])
    assert "quant" in calibrated
    # every ConvBNAct recorded a strictly positive activation absmax
    leaves = jax.tree_util.tree_leaves(calibrated["quant"])
    assert len(leaves) == 3
    assert all(float(v) > 0 for v in leaves)

    y_float = model.apply(variables, x)
    with quant.quantized("int8"):
        y_int8 = jax.jit(lambda v, x: model.apply(v, x))(calibrated, x)

    y_float = np.asarray(y_float, np.float32)
    y_int8 = np.asarray(y_int8, np.float32)
    # int8 with per-channel weights / per-tensor acts tracks the float path
    denom = np.abs(y_float).mean() + 1e-6
    assert np.abs(y_int8 - y_float).mean() / denom < 0.05
    cc = np.corrcoef(y_float.ravel(), y_int8.ravel())[0, 1]
    assert cc > 0.99


def test_param_tree_checkpoint_compatible():
    """The quantized trace must consume the exact float param tree (so float
    orbax checkpoints restore with no conversion)."""
    model = _small_stack()
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    with quant.quantized("calibrate"):
        q_variables = model.init(jax.random.PRNGKey(0), x)

    float_tree = jax.tree_util.tree_structure(variables["params"])
    quant_tree = jax.tree_util.tree_structure(q_variables["params"])
    assert float_tree == quant_tree
    float_shapes = jax.tree_util.tree_map(lambda a: a.shape, variables["params"])
    quant_shapes = jax.tree_util.tree_map(lambda a: a.shape, q_variables["params"])
    assert float_shapes == quant_shapes


def test_int8_without_calibration_raises():
    model = _small_stack()
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    with pytest.raises(Exception):
        with quant.quantized("int8"):
            model.apply(variables, x)


def test_db_model_int8_prob_map():
    """Full DB det model: int8 prob map stays a valid probability map close
    to the float one."""
    model = build_model(
        {
            "model_type": "det",
            "algorithm": "DB",
            "Transform": None,
            "Backbone": {"name": "ResNet", "layers": 18},
            "Neck": {"name": "FPN", "out_channels": 64, "mode": "DB"},
            "Head": {"name": "DBHead", "k": 50},
        }
    )
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    calibrated = quant.calibrate(model, variables, [x])
    y_float = np.asarray(
        model.apply(variables, x, train=False)["maps"], np.float32
    )
    with quant.quantized("int8"):
        y_int8 = np.asarray(
            jax.jit(lambda v, a: model.apply(v, a, train=False)["maps"])(
                calibrated, x
            ),
            np.float32,
        )
    assert y_int8.shape == y_float.shape
    assert np.all(y_int8 >= 0) and np.all(y_int8 <= 1)
    assert np.abs(y_int8 - y_float).mean() < 0.05


def test_jitrunner_quant_roundtrip():
    import sys, os

    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
    from deploy.common import JitRunner

    model = _small_stack()
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 255, (1, 32, 32, 3)).astype(np.uint8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    runner = JitRunner(
        model, variables, mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]
    )
    y_float = np.asarray(runner(imgs), np.float32)

    runner.calibrate([imgs])
    y_int8 = np.asarray(runner(imgs), np.float32)
    denom = np.abs(y_float).mean() + 1e-6
    assert np.abs(y_int8 - y_float).mean() / denom < 0.08


def test_quant_jit_mode_is_cache_key():
    """quant_jit keys the jit cache on the quantization mode: a function
    first traced in float mode must NOT silently reuse that trace when later
    called inside quantized() (ADVICE r1 — plain jax.jit does exactly that)."""
    model = _small_stack()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    calibrated = quant.calibrate(model, variables, [x])

    f = quant.quant_jit(lambda v, xx: model.apply(v, xx))
    y_float = np.asarray(f(calibrated, x), np.float32)  # traced in float mode
    with quant.quantized("int8"):
        y_int8 = np.asarray(f(calibrated, x), np.float32)

    # the int8 call must have produced a genuinely quantized result (small
    # but non-zero rounding error), not replayed the float executable
    assert not np.array_equal(y_float, y_int8)
    denom = np.abs(y_float).mean() + 1e-6
    assert np.abs(y_int8 - y_float).mean() / denom < 0.05
