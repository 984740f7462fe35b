"""Build-and-forward checks for every backbone/neck/head family
(SURVEY.md §2.3 inventory)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchocr_tpu.modeling import build_model


def _forward(cfg, shape, train=False, data=None):
    model = build_model(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(*shape).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x,
        data=data,
        train=train,
    )
    out = model.apply(
        variables, x, data=data, train=train,
        mutable=["batch_stats"] if train else False,
        rngs={"dropout": jax.random.PRNGKey(2)} if train else None,
    )
    return out[0] if train else out


DET_BACKBONES = [
    {"name": "ResNet", "layers": 18},
    {"name": "MobileNetV3", "model_name": "small", "width_mult": 1.0, "use_se": True},
    {"name": "ShuffleNetV2", "scale": 0.5},
    {"name": "RepVGG", "model_name": "A0"},
    {"name": "ConvNeXt", "model_name": "tiny", "drop_path_rate": 0.0},
    {"name": "PPLCNet", "scale": 1.0},
]


@pytest.mark.parametrize("backbone", DET_BACKBONES, ids=lambda b: b["name"])
def test_det_backbone_fpn_db(backbone):
    cfg = {
        "model_type": "det",
        "algorithm": "DB",
        "Transform": None,
        "Backbone": backbone,
        "Neck": {"name": "FPN", "out_channels": 32, "mode": "DB"},
        "Head": {"name": "DBHead", "k": 50},
    }
    out = _forward(cfg, (1, 64, 64, 3))
    assert out["maps"].shape == (1, 64, 64, 1)


def test_resnet_stem_space_to_depth():
    """stem_space_to_depth keeps the DB pyramid contract: same output
    shapes as the 7x7/s2 stem (the packed 4x4/s1 conv halves resolution
    via the space-to-depth reshape instead of the stride)."""
    base = {
        "model_type": "det",
        "algorithm": "DB",
        "Transform": None,
        "Neck": {"name": "FPN", "out_channels": 32, "mode": "DB"},
        "Head": {"name": "DBHead", "k": 50},
    }
    out_raw = _forward(
        {**base, "Backbone": {"name": "ResNet", "layers": 18}}, (1, 64, 64, 3))
    out_s2d = _forward(
        {**base, "Backbone": {"name": "ResNet", "layers": 18,
                              "stem_space_to_depth": True}}, (1, 64, 64, 3))
    assert out_s2d["maps"].shape == out_raw["maps"].shape


def test_swin_backbone():
    cfg = {
        "model_type": "det",
        "algorithm": "DB",
        "Transform": None,
        "Backbone": {"name": "SwinTransformer", "embed_dim": 32,
                     "depths": (1, 1, 1, 1), "num_heads": (1, 2, 4, 8),
                     "drop_path_rate": 0.0},
        "Neck": {"name": "FPN", "out_channels": 32, "mode": "DB"},
        "Head": {"name": "DBHead", "k": 50},
    }
    out = _forward(cfg, (1, 64, 64, 3))
    assert out["maps"].shape == (1, 64, 64, 1)


def test_pse_model():
    cfg = {
        "model_type": "det",
        "algorithm": "PSE",
        "Transform": None,
        "Backbone": {"name": "ResNet", "layers": 18},
        "Neck": {"name": "FPN", "out_channels": 32},
        "Head": {"name": "PSEHead", "hidden_dim": 32, "out_channels": 7},
    }
    out = _forward(cfg, (1, 64, 64, 3))
    assert out["maps"].shape == (1, 16, 16, 7)


def test_pan_model_fpem_ffm():
    cfg = {
        "model_type": "det",
        "algorithm": "PAN",
        "Transform": None,
        "Backbone": {"name": "ResNet", "layers": 18},
        "Neck": {"name": "FPEM_FFM", "out_channels": 32, "mode": "v2"},
        "Head": {"name": "PANHead", "hidden_dim": 32, "out_channels": 6},
    }
    out = _forward(cfg, (1, 64, 64, 3))
    assert out["maps"].shape == (1, 16, 16, 6)


def test_rec_resnet_and_mbv3():
    for backbone in (
        {"name": "ResNet", "layers": 34},
        {"name": "MobileNetV3", "model_name": "small", "width_mult": 0.5},
    ):
        cfg = {
            "model_type": "rec",
            "algorithm": "CRNN",
            "in_channels": 3,
            "Transform": None,
            "Backbone": backbone,
            "Neck": {"name": "SequenceEncoder", "encoder_type": "rnn", "hidden_size": 32},
            "Head": {"name": "CTCHead", "out_channels": 37},
        }
        out = _forward(cfg, (2, 32, 64, 3))
        assert out.shape[0] == 2 and out.shape[2] == 37


def test_starnet_tps():
    cfg = {
        "model_type": "rec",
        "algorithm": "STARNet",
        "in_channels": 1,
        "Transform": {"name": "TPS", "num_fiducial": 20, "model_name": "small"},
        "Backbone": {"name": "VGG", "model_name": "v1", "scale": 0.5},
        "Neck": {"name": "SequenceEncoder", "encoder_type": "rnn", "hidden_size": 32},
        "Head": {"name": "CTCHead", "out_channels": 37},
    }
    out = _forward(cfg, (2, 32, 64, 1))
    assert out.shape[0] == 2 and out.shape[2] == 37


def test_table_slanet():
    cfg = {
        "model_type": "table",
        "algorithm": "SLANet",
        "Transform": None,
        "Backbone": {"name": "PPLCNet", "scale": 1.0},
        "Neck": {"name": "CSPPAN", "out_channels": 32, "mode": "table"},
        "Head": {"name": "SLAHead", "hidden_size": 32, "out_channels": 30,
                 "max_text_length": 8, "loc_reg_num": 4},
    }
    out = _forward(cfg, (2, 64, 64, 3))
    assert out["structure_probs"].shape == (2, 9, 30)
    assert out["loc_preds"].shape == (2, 9, 4)
    # eval probs sum to 1
    s = np.asarray(out["structure_probs"].sum(-1))
    assert np.allclose(s, 1.0, atol=1e-4)

    # teacher forcing path
    structure = np.zeros((2, 10), np.int64)
    out_t = _forward(cfg, (2, 64, 64, 3), train=True,
                     data=(None, jnp.asarray(structure)))
    assert out_t["structure_probs"].shape == (2, 9, 30)


def test_repvgg_reparameterize():
    from pytorchocr_tpu.modeling.backbones.det_repvgg import (
        RepVGG, reparameterize_params,
    )

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32))
    train_model = RepVGG(model_name="A0")
    variables = train_model.init(rng, x, train=False)
    y_train = train_model.apply(variables, x, train=False)

    deploy_params = reparameterize_params(
        jax.device_get(variables["params"]), jax.device_get(variables["batch_stats"])
    )
    deploy_model = RepVGG(model_name="A0", deploy=True)
    y_deploy = deploy_model.apply({"params": deploy_params}, x, train=False)
    # fused-vs-unfused float32 drift compounds across the 21 stacked blocks
    for a, b in zip(y_train, y_deploy):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=0.05)
