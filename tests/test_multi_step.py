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


def test_multi_step_applies_input_transform():
    """Global.device_normalize + steps_per_dispatch>1: the stacked path
    must apply the same on-device normalize as the per-step path did
    (regression: make_multi_train_step used to silently drop it, feeding
    raw uint8 to the model)."""
    from pytorchocr_tpu.trainer import build_input_transform

    spec = [
        {"op": "ToTensor", "params": {}},
        {"op": "Normalize", "params": {"mean": [0.5], "std": [0.5]}},
    ]
    transform = build_input_transform(spec)

    rng = np.random.RandomState(1)
    n = 8
    batches = []
    for s in range(2):
        images = rng.randint(0, 255, (n, 32, 64, 1)).astype(np.uint8)
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
            "Neck": {"name": "SequenceEncoder", "encoder_type": "reshape"},
            "Head": {"name": "CTCHead", "out_channels": 37},
        }
    )
    loss_fn = build_loss({"name": "CTCLoss"})
    tx, _ = build_optimizer(
        {"base_lr": 1e-2, "optim": {"name": "SGD", "momentum": 0.9}},
        epochs=1, step_each_epoch=1,
    )
    mesh = create_mesh()
    step = make_train_step(model, loss_fn, tx, mesh, donate=False,
                           input_transform=transform)
    multi = make_multi_train_step(model, loss_fn, tx, mesh, donate=False,
                                  input_transform=transform)

    state_a = create_train_state(model, tx, jax.random.PRNGKey(0), batches[0],
                                 input_transform=transform)
    for b in batches:
        dbi = tuple(shard_batch(jnp.asarray(x), mesh) for x in b)
        state_a, losses_a = step(state_a, dbi)

    state_b = create_train_state(model, tx, jax.random.PRNGKey(0), batches[0],
                                 input_transform=transform)
    stacked = tuple(jnp.asarray(x) for x in stack_batches(batches))
    state_b, losses_b = multi(state_b, stacked)
    np.testing.assert_allclose(
        np.asarray(losses_a["loss"]), np.asarray(losses_b["loss"]), rtol=5e-3
    )
    # and the normalize really ran: an un-normalized twin diverges
    multi_raw = make_multi_train_step(model, loss_fn, tx, mesh, donate=False)
    state_c = create_train_state(model, tx, jax.random.PRNGKey(0), batches[0],
                                 input_transform=transform)
    _, losses_raw = multi_raw(state_c, stacked)
    assert not np.allclose(
        np.asarray(losses_b["loss"]), np.asarray(losses_raw["loss"]), rtol=1e-3
    )


def test_frozen_transform_updates_gated_by_step():
    """Global.freeze_transform_epochs: the transform subtree receives no
    optimizer updates while step < until_step, then starts moving."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorchocr_tpu.losses import build_loss
    from pytorchocr_tpu.modeling import build_model
    from pytorchocr_tpu.optimizer import build_optimizer
    from pytorchocr_tpu.parallel.mesh import create_mesh, shard_batch
    from pytorchocr_tpu.trainer import create_train_state, make_train_step

    cfg = {
        "model_type": "rec", "algorithm": "CRNN", "in_channels": 1,
        "Transform": {"name": "TPS", "num_fiducial": 20, "model_name": "small"},
        "Backbone": {"name": "VGG", "model_name": "v1", "scale": 0.5},
        "Neck": {"name": "SequenceEncoder", "encoder_type": "rnn",
                 "hidden_size": 32},
        "Head": {"name": "CTCHead", "out_channels": 37},
    }
    model = build_model(cfg)
    loss_fn = build_loss({"name": "CTCLoss"})
    tx, _ = build_optimizer(
        {"base_lr": 0.01, "optim": {"name": "Adam"},
         "lr_decay": {"name": "WarmupPolyLR", "warmup_epoch": 0, "power": 0.9}},
        epochs=1, step_each_epoch=10,
    )
    mesh = create_mesh()
    rng = np.random.RandomState(0)
    batch = (
        rng.rand(8, 32, 100, 1).astype(np.float32),
        rng.randint(1, 37, (8, 25)).astype(np.int32),
        np.full((8,), 5, np.int32),
    )
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, loss_fn, tx, mesh, donate=False,
                           frozen=(("transform", 2),))
    dbatch = tuple(shard_batch(jnp.asarray(x), mesh) for x in batch)

    t0 = jax.tree.map(np.asarray, state.params["transform"])
    b0 = jax.tree.map(np.asarray, state.params["backbone"])
    state, _ = step(state, dbatch)   # state.step 0 -> frozen
    state, _ = step(state, dbatch)   # state.step 1 -> frozen
    t1 = state.params["transform"]
    same = jax.tree.map(lambda a, b: np.array_equal(a, np.asarray(b)), t0, t1)
    assert all(jax.tree.leaves(same)), "transform moved while frozen"
    changed = jax.tree.map(
        lambda a, b: not np.allclose(a, np.asarray(b)), b0,
        state.params["backbone"],
    )
    assert any(jax.tree.leaves(changed)), "backbone should train"
    state, _ = step(state, dbatch)   # state.step 2 -> unfrozen
    t2 = state.params["transform"]
    moved = jax.tree.map(
        lambda a, b: not np.allclose(a, np.asarray(b)), t0, t2)
    assert any(jax.tree.leaves(moved)), "transform should unfreeze at step 2"
