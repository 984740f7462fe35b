"""Data-parallel correctness: an 8-way sharded train step must produce the
same losses, params and (Sync)BatchNorm statistics as the identical
computation replicated on one device — the global-view jit contract that
replaces DDP + SyncBatchNorm."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorchocr_tpu.losses import build_loss
from pytorchocr_tpu.modeling import build_model
from pytorchocr_tpu.optimizer import build_optimizer
from pytorchocr_tpu.parallel.mesh import create_mesh, shard_batch
from pytorchocr_tpu.trainer import create_train_state, make_train_step


def _setup():
    rng = np.random.RandomState(0)
    n, hw = 8, 64
    batch = (
        rng.rand(n, hw, hw, 3).astype(np.float32),
        rng.rand(n, hw, hw).astype(np.float32) * 0.4 + 0.3,
        (rng.rand(n, hw, hw) > 0.5).astype(np.float32),
        (rng.rand(n, hw, hw) > 0.7).astype(np.float32),
        np.ones((n, hw, hw), np.float32),
    )
    model = build_model(
        {
            "model_type": "det",
            "algorithm": "DB",
            "Transform": None,
            "Backbone": {"name": "MobileNetV3", "model_name": "small",
                         "width_mult": 0.5, "use_se": False},
            "Neck": {"name": "FPN", "out_channels": 32, "mode": "DB"},
            "Head": {"name": "DBHead", "k": 50},
        }
    )
    loss_fn = build_loss({"name": "DBLoss", "balance_loss": True,
                          "main_loss_type": "BCELoss", "alpha": 1, "beta": 10,
                          "ohem_ratio": 3})
    tx, _ = build_optimizer(
        {"base_lr": 1e-3, "optim": {"name": "Adam"}}, epochs=1, step_each_epoch=1
    )
    return model, loss_fn, tx, batch


def _run(mesh, model, loss_fn, tx, batch):
    """One forward+backward on the mesh; returns (grads, new batch_stats,
    losses) — gradient comparison is robust where post-Adam params are not
    (Adam's m/sqrt(v) turns reduction-order noise on near-zero grads into
    full-lr sign flips)."""
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    dbatch = tuple(shard_batch(jnp.asarray(x), mesh) for x in batch)

    from pytorchocr_tpu.parallel.mesh import replicated_sharding

    @jax.jit
    def grad_step(params, batch_stats, db):
        def inner(p):
            preds, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                db[0], data=db, train=True, mutable=["batch_stats"],
            )
            losses = loss_fn(preds, db)
            return losses["loss"], (losses, mut["batch_stats"])

        (_, (losses, new_bs)), grads = jax.value_and_grad(inner, has_aux=True)(params)
        return grads, new_bs, losses

    state = jax.device_put(state, replicated_sharding(mesh))
    grads, new_bs, losses = grad_step(state.params, state.batch_stats, dbatch)
    return jax.device_get(grads), jax.device_get(new_bs), jax.device_get(losses)


def test_sharded_matches_single_device():
    model, loss_fn, tx, batch = _setup()

    mesh8 = create_mesh()  # 8-way data parallel
    assert mesh8.shape["data"] == 8
    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))

    grads8, bs8, losses8 = _run(mesh8, model, loss_fn, tx, batch)
    grads1, bs1, losses1 = _run(mesh1, model, loss_fn, tx, batch)

    # losses identical (OHEM sort, dice, L1 all global reductions)
    for k in losses8:
        np.testing.assert_allclose(
            np.asarray(losses8[k]), np.asarray(losses1[k]), rtol=1e-4, atol=1e-5
        )

    # gradients agree: the implicit cross-shard all-reduce reproduces the
    # single-device gradient up to float reduction-order noise
    for a, b in zip(jax.tree.leaves(grads8), jax.tree.leaves(grads1)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)

    # BatchNorm running stats identical: statistics were computed over the
    # GLOBAL batch on the sharded mesh (SyncBN for free)
    for a, b in zip(jax.tree.leaves(bs8), jax.tree.leaves(bs1)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_forces_cpu_mesh():
    """Driver-shaped invocation of __graft_entry__.dryrun_multichip: even when
    the calling process has already initialized a jax backend with the WRONG
    device count/platform, the dryrun must still execute on a real 8-device
    CPU mesh (round-1 regression: it silently ran on one TPU device)."""
    import os
    import subprocess
    import sys

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import os; os.environ.pop('XLA_FLAGS', None)\n"
        "import jax\n"
        "assert len(jax.devices()) == 1  # hostile: backend pinned to 1 device\n"
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n" % repo
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun dp(8) OK" in out.stdout
    assert "dryrun dp+tp(8 = 4x2) OK" in out.stdout
