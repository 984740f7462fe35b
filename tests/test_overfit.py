"""Learning-path validation: the models must actually LEARN (overfit a tiny
synthetic set), not merely produce finite losses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchocr_tpu.losses import build_loss
from pytorchocr_tpu.modeling import build_model
from pytorchocr_tpu.optimizer import build_optimizer
from pytorchocr_tpu.parallel.mesh import create_mesh, shard_batch
from pytorchocr_tpu.postprocess import build_post_process
from pytorchocr_tpu.trainer import create_train_state, make_eval_step, make_train_step


def test_crnn_overfits_tiny_set():
    """CRNN must reach near-zero CTC loss and decode the training strings
    exactly after a few hundred steps on 8 fixed samples."""
    rng = np.random.RandomState(0)
    n = 8
    # synthetic "glyphs": each of 4 classes is a distinct vertical stripe
    # pattern; text = 3 glyphs side by side
    texts = ["012", "123", "230", "301", "013", "320", "102", "231"]
    glyphs = rng.rand(4, 32, 16).astype(np.float32)
    images = np.zeros((n, 32, 64, 1), np.float32)
    labels = np.zeros((n, 25), np.int64)
    lengths = np.zeros((n,), np.int64)
    for i, t in enumerate(texts):
        for j, ch in enumerate(t):
            images[i, :, 8 + j * 16 : 24 + j * 16, 0] = glyphs[int(ch)]
        # charset indices: blank=0, '0'->1 .. '3'->4
        labels[i, : len(t)] = [int(c) + 1 for c in t]
        lengths[i] = len(t)

    model = build_model(
        {
            "model_type": "rec",
            "algorithm": "CRNN",
            "in_channels": 1,
            "Transform": None,
            "Backbone": {"name": "VGG", "model_name": "v1", "scale": 0.5},
            "Neck": {"name": "SequenceEncoder", "encoder_type": "rnn",
                     "hidden_size": 48},
            "Head": {"name": "CTCHead", "out_channels": 37},
        }
    )
    loss_fn = build_loss({"name": "CTCLoss"})
    tx, _ = build_optimizer(
        {"base_lr": 3e-3, "optim": {"name": "Adam"}}, epochs=1, step_each_epoch=1
    )
    mesh = create_mesh()
    batch = (images, labels, lengths)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, loss_fn, tx, mesh)
    dbatch = tuple(shard_batch(jnp.asarray(x), mesh) for x in batch)

    first = None
    for i in range(400):
        state, losses = step(state, dbatch)
        # periodic sync keeps the async dispatch queue bounded (the real
        # train loop syncs at log steps)
        if first is None or i % 25 == 0:
            cur = float(losses["loss"])
            if first is None:
                first = cur
    final = float(losses["loss"])
    assert final < 0.2, "CTC loss did not converge: %.3f -> %.3f" % (first, final)

    # greedy decode recovers the strings
    post = build_post_process({"name": "CTCLabelDecode"}, {"character_dict_path": None})
    eval_step = make_eval_step(model, mesh)
    probs = eval_step(state.params, state.batch_stats, jnp.asarray(images))
    decoded = [t for t, _ in post(probs)]
    want = [t for t in texts]
    assert decoded == want, (decoded, want)


def test_db_overfits_tiny_set():
    """DB must localize a fixed box pattern: after overfitting, the device
    postprocess recovers boxes overlapping the GT regions."""
    rng = np.random.RandomState(0)
    n, hw = 8, 128
    images = np.full((n, hw, hw, 3), 0.9, np.float32)
    shrink_map = np.zeros((n, hw, hw), np.float32)
    thresh_map = np.full((n, hw, hw), 0.3, np.float32)
    thresh_mask = np.zeros((n, hw, hw), np.float32)
    boxes_gt = []
    for i in range(n):
        x, y = 12 + 6 * i, 20 + 5 * i
        w, h = 64, 24
        images[i, y : y + h, x : x + w, :] = 0.05
        sx, sy = int(w * 0.2), int(h * 0.2)
        shrink_map[i, y + sy : y + h - sy, x + sx : x + w - sx] = 1.0
        boxes_gt.append((x, y, w, h))
    shrink_mask = np.ones((n, hw, hw), np.float32)

    model = build_model(
        {
            "model_type": "det",
            "algorithm": "DB",
            "Transform": None,
            "Backbone": {"name": "ResNet", "layers": 18},
            "Neck": {"name": "FPN", "out_channels": 48, "mode": "DB"},
            "Head": {"name": "DBHead", "k": 50},
        }
    )
    loss_fn = build_loss({"name": "DBLoss", "balance_loss": True,
                          "main_loss_type": "BCELoss", "alpha": 1, "beta": 10,
                          "ohem_ratio": 3})
    tx, _ = build_optimizer(
        {"base_lr": 2e-3, "optim": {"name": "Adam"}}, epochs=1, step_each_epoch=1
    )
    mesh = create_mesh()
    batch = (images, thresh_map, thresh_mask, shrink_map, shrink_mask)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, loss_fn, tx, mesh)
    dbatch = tuple(shard_batch(jnp.asarray(x), mesh) for x in batch)
    for i in range(220):
        state, losses = step(state, dbatch)
        if i % 20 == 0:
            float(losses["loss"])  # bound the async queue
    assert float(losses["loss_shrink_maps"]) < 0.6

    eval_step = make_eval_step(model, mesh)
    post = build_post_process(
        {"name": "DBPostProcess", "thresh": 0.3, "box_thresh": 0.5,
         "unclip_ratio": 1.5, "score_mode": "poly"}
    )
    preds = eval_step(state.params, state.batch_stats, jnp.asarray(images))
    res = post(preds, [[hw, hw, 1.0, 1.0]] * n)
    hits = 0
    for i, (x, y, w, h) in enumerate(boxes_gt):
        for box in res[i]["points"]:
            bx = np.asarray(box)
            cx, cy = bx[:, 0].mean(), bx[:, 1].mean()
            if x <= cx <= x + w and y <= cy <= y + h:
                hits += 1
                break
    assert hits >= 6, "detected boxes matched only %d/8 GT regions" % hits
