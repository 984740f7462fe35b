"""Worker for tests/test_multihost.py: one JAX process of a 2-process CPU
cluster (4 virtual devices each -> 8 global).

Exercises, per process, exactly the multi-host path the trainer uses
(reference rank semantics: tools/program.py:122-135, DistributedSampler
pytocr/data/__init__.py:42-47):
  * jax.distributed.initialize against a local coordinator;
  * build_dataloader Train-mode per-host sharding (shard_index/num_shards
    from jax.process_index/count);
  * shard_batch -> jax.make_array_from_process_local_data forming a GLOBAL
    batch from per-process local shards;
  * one jitted data-parallel DB train step over the global 8-device mesh
    (gradient all-reduce crosses the process boundary);
  * jax.process_index()==0 gating (only rank 0 writes the artifact the
    parent asserts on).

Writes result_<pid>.json with the per-process observations.
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    outdir = sys.argv[3]
    datadir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address="localhost:%s" % port, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
    import numpy as np
    import jax.numpy as jnp

    from pytorchocr_tpu.data import build_dataloader
    from pytorchocr_tpu.losses import build_loss
    from pytorchocr_tpu.optimizer import build_optimizer
    from pytorchocr_tpu.parallel.mesh import create_mesh, shard_batch
    from pytorchocr_tpu.trainer import create_train_state, make_train_step
    from pytorchocr_tpu.utils.logging import get_logger

    # --- loader: per-host sharding must give this process a distinct half ---
    config = {
        "Global": {"distributed": True},
        "Train": {
            "dataset": {
                "name": "SimpleDataSet",
                "data_dir": datadir,
                "label_file_list": [os.path.join(datadir, "rec_label.txt")],
                "transforms": [
                    {"DecodeImage": {"img_mode": "BGR", "channel_first": False}},
                    {"KeepKeys": {"keep_keys": ["img_path"]}},
                ],
            },
            "loader": {
                "shuffle": False,
                "batch_size_per_card": 2,
                "drop_last": False,
                "num_workers": 0,
            },
        },
    }
    loader, _ = build_dataloader(config, "Train", get_logger())
    seen = []
    for batch in loader:
        seen.extend([p.decode() if isinstance(p, bytes) else str(p) for p in batch[0]])

    # --- global batch + cross-process train step ---
    rng = np.random.RandomState(pid)  # DIFFERENT data per process
    local = 4
    batch_np = (
        rng.rand(local, 64, 64, 3).astype(np.float32),
        rng.rand(local, 64, 64).astype(np.float32) * 0.4 + 0.3,
        (rng.rand(local, 64, 64) > 0.5).astype(np.float32),
        (rng.rand(local, 64, 64) > 0.7).astype(np.float32),
        np.ones((local, 64, 64), np.float32),
    )
    mesh = create_mesh()
    assert mesh.devices.size == 8

    from pytorchocr_tpu.modeling import build_model

    model = build_model(
        {
            "model_type": "det",
            "algorithm": "DB",
            "Transform": None,
            "Backbone": {"name": "MobileNetV3", "model_name": "small",
                         "width_mult": 0.35, "use_se": False},
            "Neck": {"name": "FPN", "out_channels": 32, "mode": "DB"},
            "Head": {"name": "DBHead", "k": 50},
        }
    )
    loss_fn = build_loss({"name": "DBLoss", "balance_loss": True,
                          "main_loss_type": "BCELoss", "alpha": 1, "beta": 10,
                          "ohem_ratio": 3})
    tx, _ = build_optimizer(
        {"base_lr": 1e-3, "optim": {"name": "Adam"}}, epochs=1, step_each_epoch=10
    )
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch_np)
    train_step = make_train_step(model, loss_fn, tx, mesh)
    # global batch: each process contributes its local arrays
    device_batch = tuple(shard_batch(jnp.asarray(x), mesh) for x in batch_np)
    assert device_batch[0].shape[0] == 8, device_batch[0].shape  # GLOBAL view
    state, losses = train_step(state, device_batch)
    loss = float(losses["loss"])
    assert np.isfinite(loss)
    # grads/params are replicated: fetch a param leaf checksum to compare
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    checksum = float(jnp.asarray(leaf).astype(jnp.float32).sum())

    # --- rank-0 gating (the trainer's eval/ckpt/log pattern) ---
    if jax.process_index() == 0:
        with open(os.path.join(outdir, "rank0_artifact"), "w") as f:
            f.write("saved by process 0\n")

    with open(os.path.join(outdir, "result_%d.json" % pid), "w") as f:
        json.dump(
            {
                "pid": pid,
                "process_index": jax.process_index(),
                "shard_paths": sorted(seen),
                "loss": loss,
                "param_checksum": checksum,
            },
            f,
        )


if __name__ == "__main__":
    main()
