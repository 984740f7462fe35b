"""DB-ResNet18 training-step throughput (fwd+bwd+Adam, SyncBN semantics)
at 640x640 — the README training number.

One jitted train step over a 1-device mesh (global-view BN == SyncBN); the
host loop re-feeds the same sharded batch so timing measures device compute
+ dispatch, amortized over ITERS steps.

Usage: python benchmarks/bench_train.py --batch 16 [--steps 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

H = W = 640


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pytorchocr_tpu.losses import build_loss
    from pytorchocr_tpu.modeling import build_model
    from pytorchocr_tpu.optimizer import build_optimizer
    from pytorchocr_tpu.parallel.mesh import create_mesh, shard_batch
    from pytorchocr_tpu.trainer import create_train_state, make_train_step

    model = build_model(
        {
            "model_type": "det",
            "algorithm": "DB",
            "Transform": None,
            "Backbone": {"name": "ResNet", "layers": 18},
            "Neck": {"name": "FPN", "out_channels": 256, "mode": "DB"},
            "Head": {"name": "DBHead", "k": 50},
        },
        dtype=jnp.bfloat16,
    )
    loss_fn = build_loss(
        {"name": "DBLoss", "balance_loss": True, "main_loss_type": "DiceLoss",
         "alpha": 1, "beta": 10, "ohem_ratio": 3}
    )
    tx, _ = build_optimizer(
        {"base_lr": 1e-3, "optim": {"name": "Adam"}}, epochs=10, step_each_epoch=100
    )

    rng = np.random.RandomState(0)
    n = args.batch
    batch = (
        rng.rand(n, H, W, 3).astype(np.float32),
        rng.rand(n, H, W).astype(np.float32),           # threshold_map
        (rng.rand(n, H, W) > 0.5).astype(np.float32),   # threshold_mask
        (rng.rand(n, H, W) > 0.5).astype(np.float32),   # shrink_map
        np.ones((n, H, W), np.float32),                  # shrink_mask
    )

    mesh = create_mesh()
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, loss_fn, tx, mesh)
    dbatch = tuple(shard_batch(jnp.asarray(x), mesh) for x in batch)

    # compile + warm (donated buffers: keep feeding the fresh state)
    t0 = time.perf_counter()
    state, losses = step(state, dbatch)
    float(losses["loss"])
    print(f"compile+warm {time.perf_counter() - t0:.1f}s", flush=True)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, losses = step(state, dbatch)
        float(losses["loss"])  # sync
        times.append(time.perf_counter() - t0)
    ips = args.batch * args.steps / min(times)
    print(f"train bs{args.batch} @ {H}x{W}: {ips:.1f} imgs/s", flush=True)


if __name__ == "__main__":
    main()
