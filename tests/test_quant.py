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


@pytest.mark.slow
def test_int8_det_output_parity_full_resolution():
    """End-to-end int8 PTQ evidence at the headline resolution: a trained DB
    model's int8 boxes at 736x1280 must match its bf16 boxes (ICDAR-protocol
    hmean vs the bf16 output >= 0.9).  Closes the gap between the small-shape
    numeric checks above and the bs128@736x1280 int8 number bench.py reports."""
    from pytorchocr_tpu.losses import build_loss
    from pytorchocr_tpu.metrics.eval_det_iou import DetectionIoUEvaluator
    from pytorchocr_tpu.optimizer import build_optimizer
    from pytorchocr_tpu.parallel.mesh import create_mesh, shard_batch
    from pytorchocr_tpu.postprocess import build_post_process
    from pytorchocr_tpu.trainer import create_train_state, make_train_step

    # --- train a dark-rectangle detector at 128px (translation-invariant
    # convs generalize it to page size) ---
    rng = np.random.RandomState(0)
    n, hw = 8, 128
    images = np.full((n, hw, hw, 3), 0.9, np.float32)
    shrink_map = np.zeros((n, hw, hw), np.float32)
    thresh_map = np.full((n, hw, hw), 0.3, np.float32)
    thresh_mask = np.zeros((n, hw, hw), np.float32)
    for i in range(n):
        for _ in range(2):
            x, y = rng.randint(4, hw - 68), rng.randint(4, hw - 28)
            w, h = 56, 20
            images[i, y : y + h, x : x + w, :] = 0.05
            sx, sy = int(w * 0.2), int(h * 0.2)
            shrink_map[i, y + sy : y + h - sy, x + sx : x + w - sx] = 1.0
    shrink_mask = np.ones((n, hw, hw), np.float32)

    model = build_model(
        {
            "model_type": "det",
            "algorithm": "DB",
            "Transform": None,
            "Backbone": {"name": "MobileNetV3", "model_name": "small",
                         "width_mult": 0.5, "use_se": False},
            "Neck": {"name": "FPN", "out_channels": 48, "mode": "DB"},
            "Head": {"name": "DBHead", "k": 50},
        }
    )
    loss_fn = build_loss({"name": "DBLoss", "balance_loss": True,
                          "main_loss_type": "BCELoss", "alpha": 1, "beta": 10,
                          "ohem_ratio": 3})
    tx, _ = build_optimizer(
        {"base_lr": 5e-3, "optim": {"name": "Adam"}}, epochs=1, step_each_epoch=1
    )
    mesh = create_mesh()
    batch = (images, thresh_map, thresh_mask, shrink_map, shrink_mask)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, loss_fn, tx, mesh)
    dbatch = tuple(shard_batch(jnp.asarray(x), mesh) for x in batch)
    for i in range(500):
        state, losses = step(state, dbatch)
        if i % 20 == 0:
            float(losses["loss"])
    assert float(losses["loss_shrink_maps"]) < 0.15

    # --- full-resolution synthetic page: word-like dark rectangles ---
    H, W = 736, 1280
    page = np.full((1, H, W, 3), 0.9, np.float32)
    for _ in range(20):
        x, y = rng.randint(8, W - 220), rng.randint(8, H - 40)
        w, h = rng.randint(90, 200), rng.randint(20, 32)
        page[0, y : y + h, x : x + w, :] = 0.05
    page = jnp.asarray(page)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    post = build_post_process(
        {"name": "DBPostProcess", "thresh": 0.3, "box_thresh": 0.5,
         "unclip_ratio": 1.5, "score_mode": "poly"}
    )
    shape_list = [[H, W, 1.0, 1.0]]

    def forward(v, x):
        return model.apply(v, x, train=False)

    preds_bf16 = jax.jit(forward)(variables, page)
    boxes_bf16 = post(preds_bf16, shape_list)[0]["points"]
    assert len(boxes_bf16) >= 10, (
        "trained model found only %d boxes at full res" % len(boxes_bf16)
    )

    calibrated = quant.calibrate(model, variables, [page])
    f = quant.quant_jit(forward)
    with quant.quantized("int8"):
        preds_int8 = f(calibrated, page)
    boxes_int8 = post(preds_int8, shape_list)[0]["points"]

    # ICDAR protocol with the bf16 output as ground truth
    ev = DetectionIoUEvaluator()
    gt = [{"points": np.asarray(b), "ignore": False} for b in boxes_bf16]
    pred = [{"points": np.asarray(b), "ignore": False} for b in boxes_int8]
    metric = ev.combine_results([ev.evaluate_image(gt, pred)])
    assert metric["hmean"] >= 0.9, (
        "int8 vs bf16 det-output hmean %.3f (bf16 %d boxes, int8 %d boxes)"
        % (metric["hmean"], len(boxes_bf16), len(boxes_int8))
    )


def test_int8_activation_flow_resnet_close_to_float():
    """q8 flow (QTensor producer-side quantization through ResNet blocks):
    int8 backbone features must track the float path.  The whole backbone's
    HBM activations are int8 under PTQ, so quant error compounds across
    blocks — assert the relative error stays small and well-correlated."""
    from pytorchocr_tpu.modeling.backbones.det_resnet import ResNet

    model = ResNet(layers=18)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    calibrated = quant.calibrate(model, variables, [x])
    y_float = model.apply(variables, x)
    f = quant.quant_jit(lambda v, xx: model.apply(v, xx))
    with quant.quantized("int8"):
        y_int8 = f(calibrated, x)

    for lvl, (a, b) in enumerate(zip(y_float, y_int8)):
        a = np.asarray(quant.dequant(a), np.float32)
        b = np.asarray(quant.dequant(b), np.float32)
        denom = np.abs(a).mean() + 1e-6
        rel = np.abs(b - a).mean() / denom
        cc = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert rel < 0.12, "C%d rel err %.3f" % (lvl + 2, rel)
        assert cc > 0.98, "C%d corr %.3f" % (lvl + 2, cc)


def test_quant_conv_transpose_matches_flax_deconv():
    """QuantConvTranspose's 1x1-conv + depth-to-space formulation must be
    numerically the transposed conv it replaces (calibrate mode == float
    math), and its int8 mode must track it closely."""
    import flax.linen as nn

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 12, 16).astype(np.float32))

    ref = nn.ConvTranspose(24, (2, 2), strides=(2, 2), use_bias=True)
    ref_vars = ref.init(jax.random.PRNGKey(1), x)

    qct = quant.QuantConvTranspose(24, (2, 2), (2, 2), use_bias=True,
                                   qmode="calibrate")
    y_ref = ref.apply(ref_vars, x)
    # same params restored into the quant twin (identical tree)
    y_cal, mut = qct.apply(
        {"params": ref_vars["params"]}, x, mutable=["quant"]
    )
    np.testing.assert_allclose(np.asarray(y_cal), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    qct8 = quant.QuantConvTranspose(24, (2, 2), (2, 2), use_bias=True,
                                    qmode="int8")
    y_int8 = qct8.apply(
        {"params": ref_vars["params"], "quant": mut["quant"]}, x
    )
    a, b = np.asarray(y_ref, np.float32), np.asarray(y_int8, np.float32)
    assert np.abs(b - a).mean() / (np.abs(a).mean() + 1e-6) < 0.03
