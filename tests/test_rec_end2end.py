"""End-to-end CRNN vertical slice: synthetic data -> loader -> model ->
CTC loss -> sharded train steps on the 8-device CPU mesh -> decode -> metric.
This is the SURVEY.md §7 step-2 milestone test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchocr_tpu.data import build_dataloader
from pytorchocr_tpu.losses import build_loss
from pytorchocr_tpu.metrics import build_metric
from pytorchocr_tpu.modeling import build_model
from pytorchocr_tpu.optimizer import build_optimizer
from pytorchocr_tpu.parallel.mesh import create_mesh
from pytorchocr_tpu.postprocess import build_post_process
from pytorchocr_tpu.trainer import create_train_state, make_eval_step, make_train_step
from pytorchocr_tpu.utils import AttrDict, get_logger
from pytorchocr_tpu.utils.config import _to_attrdict

from synth import make_rec_dataset


def rec_config(label_file):
    return _to_attrdict(
        {
            "Global": {
                "use_amp": False,
                "distributed": False,
                "seed": 7,
                "character_dict_path": None,
                "max_text_length": 25,
                "use_space_char": False,
            },
            "Architecture": {
                "model_type": "rec",
                "algorithm": "CRNN",
                "in_channels": 1,
                "Transform": None,
                "Backbone": {"name": "VGG", "model_name": "v1", "scale": 0.5},
                "Neck": {
                    "name": "SequenceEncoder",
                    "encoder_type": "rnn",
                    "hidden_size": 48,
                },
                "Head": {"name": "CTCHead"},
            },
            "Loss": {"name": "CTCLoss"},
            "Optimizer": {
                "base_lr": 0.001,
                "optim": {"name": "Adam", "betas": (0.9, 0.999), "amsgrad": True},
                "lr_decay": {"name": "WarmupPolyLR", "warmup_epoch": 1, "power": 0.9},
            },
            "PostProcess": {"name": "CTCLabelDecode"},
            "Metric": {"name": "RecMetric", "main_indicator": "acc"},
            "Train": {
                "dataset": {
                    "name": "SimpleDataSet",
                    "label_file_list": [label_file],
                    "transforms": [
                        {"DecodeImage": {"img_mode": "GRAY"}},
                        {"CTCLabelEncode": None},
                        {"RecResizeImg": {"image_shape": [1, 32, 96]}},
                        {"KeepKeys": {"keep_keys": ["image", "label", "length"]}},
                    ],
                },
                "loader": {
                    "shuffle": True,
                    "batch_size_per_card": 8,
                    "drop_last": True,
                    "num_workers": 2,
                },
            },
            "Eval": {
                "dataset": {
                    "name": "SimpleDataSet",
                    "label_file_list": [label_file],
                    "transforms": [
                        {"DecodeImage": {"img_mode": "GRAY"}},
                        {"CTCLabelEncode": None},
                        {"RecResizeImg": {"image_shape": [1, 32, 96]}},
                        {"KeepKeys": {"keep_keys": ["image", "label", "length"]}},
                    ],
                },
                "loader": {
                    "shuffle": False,
                    "batch_size_per_card": 8,
                    "drop_last": False,
                    "num_workers": 2,
                },
            },
        }
    )


def test_crnn_end_to_end(tmp_path):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    label_file = make_rec_dataset(str(tmp_path))
    config = rec_config(label_file)
    logger = get_logger("test_rec")

    train_loader, _ = build_dataloader(config, "Train", logger, seed=7)
    post = build_post_process(config["PostProcess"], config["Global"])
    config["Architecture"]["Head"]["out_channels"] = len(post.character)
    assert len(post.character) == 37  # blank + 0-9a-z

    model = build_model(config["Architecture"])
    loss_fn = build_loss(config["Loss"])
    tx, lr_schedule = build_optimizer(
        config["Optimizer"], epochs=4, step_each_epoch=len(train_loader)
    )
    mesh = create_mesh()
    assert mesh.shape["data"] == 8

    batches = list(train_loader)
    assert batches, "loader yielded no batches"
    b0 = batches[0]
    assert b0[0].shape == (8, 32, 96, 1)
    assert b0[1].shape == (8, 25)

    state = create_train_state(model, tx, jax.random.PRNGKey(0), b0)
    train_step = make_train_step(model, loss_fn, tx, mesh)

    from pytorchocr_tpu.parallel.mesh import shard_batch

    losses_hist = []
    for step in range(6):
        b = batches[step % len(batches)]
        device_b = tuple(shard_batch(jnp.asarray(x), mesh) for x in b)
        state, losses = train_step(state, device_b)
        val = float(losses["loss"])
        assert np.isfinite(val)
        losses_hist.append(val)
    assert losses_hist[-1] < losses_hist[0] * 1.5  # training is not diverging

    # eval path: forward -> decode -> metric
    eval_step = make_eval_step(model, mesh)
    metric = build_metric(config["Metric"])
    b = batches[0]
    probs = eval_step(
        state.params, state.batch_stats, shard_batch(jnp.asarray(b[0]), mesh)
    )
    assert probs.shape[0] == 8 and probs.shape[2] == 37
    post_result = post(probs, b[1])
    res = metric(post_result)
    assert "acc" in res and "norm_edit_dis" in res
    out = metric.get_metric()
    assert 0.0 <= out["acc"] <= 1.0


def test_ctc_decode_golden():
    """Decode semantics: dedup-collapse then blank removal."""
    from pytorchocr_tpu.postprocess.rec_postprocess import CTCLabelDecode

    dec = CTCLabelDecode(character_dict_path=None)
    # classes: 0=blank, 1='0', 2='1', ... 11='a'
    T, C = 8, 40
    probs = np.zeros((1, T, C), dtype=np.float32)
    seq = [1, 1, 0, 1, 2, 2, 0, 11]  # -> "0" "0" (dedup within run) ...
    for t, c in enumerate(seq):
        probs[0, t, c] = 1.0
    out = dec(probs)
    # runs: 1,1 -> '0'; blank; 1 -> '0'; 2,2 -> '1'; blank; 11 -> 'a'
    assert out[0][0] == "0" + "0" + "1" + "a"
    assert abs(out[0][1] - 1.0) < 1e-6


def test_ctc_device_collapse_matches_host():
    """Device greedy collapse == the host per-timestep decode on random and
    adversarial (repeat/blank-boundary) sequences."""
    from pytorchocr_tpu.ops.ctc_decode import ctc_greedy_collapse
    from pytorchocr_tpu.postprocess.rec_postprocess import CTCLabelDecode

    dec = CTCLabelDecode(character_dict_path=None)
    rng = np.random.RandomState(0)
    N, T, C = 16, 40, 37
    logits = rng.randn(N, T, C).astype(np.float32)
    # make repeats and blanks common
    logits[:, :, 0] += 1.0
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    host = dec.decode(probs.argmax(2), probs.max(2), is_remove_duplicate=True)
    dev = dec(jnp.asarray(probs))
    assert [t for t, _ in host] == [t for t, _ in dev]
    for (_, ph), (_, pd) in zip(host, dev):
        if not np.isnan(ph):
            assert abs(ph - pd) < 1e-5
