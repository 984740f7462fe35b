"""Multi-step-per-dispatch training (lax.scan over stacked batches) must
match per-step dispatch exactly."""

import numpy as np

import jax
import jax.numpy as jnp

from pytorchocr_tpu.losses import build_loss
from pytorchocr_tpu.modeling import build_model
from pytorchocr_tpu.optimizer import build_optimizer
from pytorchocr_tpu.parallel.mesh import create_mesh, shard_batch
from pytorchocr_tpu.trainer import (
    create_train_state,
    make_multi_train_step,
    make_train_step,
    stack_batches,
)


def test_multi_step_matches_single_steps():
    rng = np.random.RandomState(0)
    n = 8
    batches = []
    for s in range(4):
        images = rng.rand(n, 32, 64, 1).astype(np.float32)
        labels = np.zeros((n, 25), np.int64)
        labels[:, :3] = rng.randint(1, 30, (n, 3))
        lengths = np.full((n,), 3, np.int64)
        batches.append((images, labels, lengths))

    model = build_model(
        {
            "model_type": "rec",
            "algorithm": "CRNN",
            "in_channels": 1,
            "Transform": None,
            "Backbone": {"name": "VGG", "model_name": "v1", "scale": 0.5},
            "Neck": {"name": "SequenceEncoder", "encoder_type": "rnn",
                     "hidden_size": 32},
            "Head": {"name": "CTCHead", "out_channels": 37},
        }
    )
    loss_fn = build_loss({"name": "CTCLoss"})
    # SGD: Adam's m/sqrt(v) amplifies float-order noise on near-zero grads
    # into lr-scale sign flips, masking the semantic comparison
    tx, _ = build_optimizer(
        {"base_lr": 1e-2, "optim": {"name": "SGD", "momentum": 0.9}},
        epochs=1, step_each_epoch=1,
    )
    mesh = create_mesh()

    step = make_train_step(model, loss_fn, tx, mesh, donate=False)
    multi = make_multi_train_step(model, loss_fn, tx, mesh, donate=False)

    # --- semantics: a k=1 multi-step must equal one plain step tightly ---
    state_a = create_train_state(model, tx, jax.random.PRNGKey(0), batches[0])
    db = tuple(shard_batch(jnp.asarray(x), mesh) for x in batches[0])
    state_a, losses_a = step(state_a, db)

    state_b = create_train_state(model, tx, jax.random.PRNGKey(0), batches[0])
    stacked1 = tuple(jnp.asarray(x) for x in stack_batches(batches[:1]))
    state_b, losses_b = multi(state_b, stacked1)

    np.testing.assert_allclose(
        np.asarray(losses_a["loss"]), np.asarray(losses_b["loss"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5)
    for a, b in zip(
        jax.tree.leaves(state_a.batch_stats), jax.tree.leaves(state_b.batch_stats)
    ):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    # --- trajectory: 4 steps either way give closely matching losses ---
    state_a = create_train_state(model, tx, jax.random.PRNGKey(0), batches[0])
    for b in batches:
        dbi = tuple(shard_batch(jnp.asarray(x), mesh) for x in b)
        state_a, losses_a = step(state_a, dbi)

    state_c = create_train_state(model, tx, jax.random.PRNGKey(0), batches[0])
    stacked = tuple(jnp.asarray(x) for x in stack_batches(batches))
    state_c, losses_c = multi(state_c, stacked)
    assert int(np.asarray(state_c.step)) == 4
    np.testing.assert_allclose(
        np.asarray(losses_a["loss"]), np.asarray(losses_c["loss"]), rtol=5e-3
    )
