"""Global.device_normalize: host ToTensor/Normalize moved into the jitted
step (uint8 wire, fused on-device normalize — the training analogue of the
deploy uint8 path and of the reference's CUDA NormMeanStd kernel,
reference deploy/trt_utils.py:33-60)."""

import numpy as np

import jax
import jax.numpy as jnp

from pytorchocr_tpu.data.imaug.operators import Normalize, ToTensor
from pytorchocr_tpu.trainer import build_input_transform

MEAN = [0.485, 0.456, 0.406]
STD = [0.229, 0.224, 0.225]
SPEC = [
    {"op": "ToTensor", "params": None},
    {"op": "Normalize", "params": {"mean": MEAN, "std": STD}},
]


def test_input_transform_matches_host_ops():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, size=(3, 16, 20, 3), dtype=np.uint8)

    host = []
    for im in imgs:
        d = {"image": im.copy()}
        d = ToTensor()(d)
        d = Normalize(mean=MEAN, std=STD)(d)
        host.append(d["image"])
    host = np.stack(host)

    tf = build_input_transform(SPEC)
    dev = np.asarray(tf(jnp.asarray(imgs)))
    np.testing.assert_allclose(dev, host, atol=1e-5)

    # NormalizeImage (combined scale+mean/std) parses its string scale
    tf2 = build_input_transform(
        [{"op": "NormalizeImage",
          "params": {"scale": "1./255.", "mean": MEAN, "std": STD}}]
    )
    np.testing.assert_allclose(np.asarray(tf2(jnp.asarray(imgs))), host, atol=1e-5)

    assert build_input_transform(None) is None
    assert build_input_transform([]) is None


def test_extract_device_normalize_strips_and_records():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from program import extract_device_normalize

    config = {
        "Global": {"device_normalize": True},
        "Train": {"dataset": {"transforms": [
            {"DecodeImage": {"img_mode": "RGB"}},
            {"ToTensor": None},
            {"Normalize": {"mean": MEAN, "std": STD}},
            {"KeepKeys": {"keep_keys": ["image"]}},
        ]}},
        "Eval": {"dataset": {"transforms": [
            {"DecodeImage": {"img_mode": "RGB"}},
            {"NormalizeImage": {"scale": "1./255.", "mean": MEAN, "std": STD}},
            {"KeepKeys": {"keep_keys": ["image"]}},
        ]}},
    }
    specs = extract_device_normalize(config)
    names = lambda m: [next(iter(e)) for e in config[m]["dataset"]["transforms"]]
    assert names("Train") == ["DecodeImage", "KeepKeys"]
    assert names("Eval") == ["DecodeImage", "KeepKeys"]
    assert [e["op"] for e in specs["Train"]] == ["ToTensor", "Normalize"]
    assert [e["op"] for e in specs["Eval"]] == ["NormalizeImage"]
    assert config["Global"]["_device_normalize_spec"] is specs


def test_train_step_equivalence_uint8_vs_host_normalized():
    """One DB train step from the same state must produce the same loss
    whether the batch arrives host-normalized f32 (default) or raw uint8
    with the on-device transform (Global.device_normalize)."""
    from pytorchocr_tpu.losses import build_loss
    from pytorchocr_tpu.modeling import build_model
    from pytorchocr_tpu.optimizer import build_optimizer
    from pytorchocr_tpu.parallel.mesh import create_mesh
    from pytorchocr_tpu.trainer import create_train_state, make_train_step

    model = build_model({
        "model_type": "det", "algorithm": "DB", "Transform": None,
        "Backbone": {"name": "MobileNetV3", "model_name": "small",
                     "width_mult": 0.35, "use_se": False},
        "Neck": {"name": "FPN", "out_channels": 32, "mode": "DB"},
        "Head": {"name": "DBHead", "k": 50},
    })
    loss_fn = build_loss({"name": "DBLoss", "balance_loss": True,
                          "main_loss_type": "BCELoss", "alpha": 1, "beta": 10,
                          "ohem_ratio": 3})
    tx, _ = build_optimizer(
        {"base_lr": 1e-3, "optim": {"name": "Adam"},
         "lr_decay": {"name": "WarmupPolyLR", "warmup_epoch": 1, "power": 0.9}},
        epochs=1, step_each_epoch=2,
    )
    mesh = create_mesh()

    rng = np.random.RandomState(1)
    n, hw = 8, 64  # divisible by the 8-device CPU test mesh
    u8 = rng.randint(0, 256, size=(n, hw, hw, 3), dtype=np.uint8)
    f32 = ((u8.astype(np.float32) / 255.0)
           - np.array(MEAN, np.float32)) / np.array(STD, np.float32)
    labels = (
        rng.rand(n, hw, hw).astype(np.float32) * 0.4 + 0.3,
        (rng.rand(n, hw, hw) > 0.5).astype(np.float32),
        (rng.rand(n, hw, hw) > 0.7).astype(np.float32),
        np.ones((n, hw, hw), np.float32),
    )
    tf = build_input_transform(SPEC)

    state_a = create_train_state(model, tx, jax.random.PRNGKey(0), (f32,) + labels)
    step_a = make_train_step(model, loss_fn, tx, mesh)
    _, losses_a = step_a(state_a, (jnp.asarray(f32),) + tuple(map(jnp.asarray, labels)))

    state_b = create_train_state(
        model, tx, jax.random.PRNGKey(0), (u8,) + labels, input_transform=tf
    )
    step_b = make_train_step(model, loss_fn, tx, mesh, input_transform=tf)
    _, losses_b = step_b(state_b, (jnp.asarray(u8),) + tuple(map(jnp.asarray, labels)))

    np.testing.assert_allclose(
        float(losses_a["loss"]), float(losses_b["loss"]), rtol=1e-4
    )


def test_extract_device_normalize_refuses_nontrailing_norm():
    """A host image op running AFTER Normalize must block extraction for
    that mode (its input semantics would change)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from program import extract_device_normalize

    config = {
        "Global": {"device_normalize": True},
        "Train": {"dataset": {"transforms": [
            {"DecodeImage": {"img_mode": "RGB"}},
            {"ToTensor": None},
            {"Normalize": {"mean": MEAN, "std": STD}},
            {"SomePaddingOp": {"pad": 4}},
            {"KeepKeys": {"keep_keys": ["image"]}},
        ]}},
    }
    specs = extract_device_normalize(config)
    assert "Train" not in specs
    names = [next(iter(e)) for e in config["Train"]["dataset"]["transforms"]]
    assert names == ["DecodeImage", "ToTensor", "Normalize", "SomePaddingOp",
                     "KeepKeys"]


def test_stall_watchdog_fires_and_respects_beats():
    """StallWatchdog must fire on_stall only after `timeout_s` without a
    beat, and never once stopped or while beaten."""
    import sys, os, time, threading
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from program import StallWatchdog

    fired = threading.Event()
    dog = StallWatchdog(0.5, "/nonexistent", None, on_stall=fired.set)
    dog.start()
    # beaten faster than the timeout: must not fire
    for _ in range(4):
        time.sleep(0.2)
        dog.beat()
    assert not fired.is_set()
    # starve it: must fire within a couple of poll cycles
    assert fired.wait(2.0), "watchdog did not fire on a stalled heartbeat"
    dog.stop()

    # disabled (timeout 0): start() is a no-op
    fired2 = threading.Event()
    dog2 = StallWatchdog(0, "/nonexistent", None, on_stall=fired2.set)
    dog2.start()
    time.sleep(0.3)
    assert not fired2.is_set()

    # stopped before expiry: must not fire
    fired3 = threading.Event()
    dog3 = StallWatchdog(0.4, "/nonexistent", None, on_stall=fired3.set)
    dog3.start()
    dog3.stop()
    time.sleep(0.8)
    assert not fired3.is_set()
