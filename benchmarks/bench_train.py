"""DB-ResNet18 training-step throughput & roofline (fwd+bwd+Adam, SyncBN
semantics) at 640x640 — the README training number and the training
section of ROOFLINE.md.

One jitted train step over a 1-device mesh (global-view BN == SyncBN); the
host loop re-feeds the same sharded batch so timing measures device compute
+ dispatch, amortized over ITERS steps.

Modes (stage split for the roofline):
  full    fwd + bwd + Adam update (the real train step; default)
  fwd     loss forward only (value, no grad)
  fwdbwd  value_and_grad, no optimizer update

--spd N runs N optimizer steps per device dispatch as one on-device
lax.scan (trainer.make_multi_train_step — Global.steps_per_dispatch);
--remat enables jax.checkpoint rematerialization. --mfu prints the
XLA-reported FLOP count and the bf16-peak utilization (v5e: 197 TFLOP/s).

Usage: python benchmarks/bench_train.py --batch 16 [--steps 8]
       [--mode full|fwd|fwdbwd] [--spd N] [--remat] [--mfu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

H = W = 640
V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--mode", choices=["full", "fwd", "fwdbwd"], default="full")
    ap.add_argument("--spd", type=int, default=1,
                    help="optimizer steps per device dispatch (lax.scan)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--s2d", action="store_true",
                    help="stem_space_to_depth backbone variant (the "
                    "conv-backprop experiment, bench_bwd_stages.py)")
    ap.add_argument("--mfu", action="store_true",
                    help="print XLA cost-analysis FLOPs and bf16-peak MFU")
    ap.add_argument("--xla", action="append", default=[],
                    help="per-computation XLA option key=value (repeatable)"
                    " — backward-pass flag sweep, e.g."
                    " --xla xla_tpu_scoped_vmem_limit_kib=65536")
    args = ap.parse_args()
    xla_opts = None
    if args.xla:
        xla_opts = dict(kv.split("=", 1) for kv in args.xla)

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
    )

    cache_dir = os.environ.get("OCR_TPU_COMPILE_CACHE", "")
    if cache_dir != "off":
        jax.config.update(
            "jax_compilation_cache_dir",
            cache_dir or os.path.expanduser("~/.cache/pytorchocr_tpu_xla"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    model = build_model(
        {
            "model_type": "det",
            "algorithm": "DB",
            "Transform": None,
            "Backbone": {"name": "ResNet", "layers": 18,
                         "stem_space_to_depth": args.s2d},
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

    label = "%s%s bs%d" % (
        args.mode, " spd%d" % args.spd if args.spd > 1 else "", args.batch
    )
    if args.remat:
        label += " remat"
    if args.s2d:
        label += " s2d"

    if args.mode == "full":
        if args.spd > 1:
            multi = make_multi_train_step(model, loss_fn, tx, mesh)
            # leading `steps` axis; per-step data sharding is applied by
            # the scan body (1-device mesh here — plain device arrays)
            stacked = tuple(jnp.asarray(np.stack([x] * args.spd)) for x in batch)
            def step(state, _):
                return multi(state, stacked)
            imgs_per_call = n * args.spd
        else:
            inner = make_train_step(model, loss_fn, tx, mesh, remat=args.remat,
                                    compiler_options=xla_opts)
            dbatch = tuple(shard_batch(jnp.asarray(x), mesh) for x in batch)
            def step(state, _):
                return inner(state, dbatch)
            imgs_per_call = n
    else:
        dbatch = tuple(shard_batch(jnp.asarray(x), mesh) for x in batch)
        imgs_per_call = n
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        def loss_of(params):
            vs = {"params": params}
            if state.batch_stats:
                vs["batch_stats"] = state.batch_stats
            preds = model.apply(vs, dbatch[0], data=dbatch, train=True,
                                mutable=["batch_stats"])[0]
            return loss_fn(preds, dbatch)["loss"]

        if args.mode == "fwd":
            fwd = jax.jit(loss_of)
            def step(state, _):
                return state, {"loss": fwd(state.params)}
        else:  # fwdbwd
            vg = jax.jit(jax.value_and_grad(loss_of))
            def step(state, _):
                loss, _g = vg(state.params)
                return state, {"loss": loss}

    # compile + warm (donated buffers: keep feeding the fresh state)
    t0 = time.perf_counter()
    state, losses = step(state, None)
    float(losses["loss"])
    print(f"[{label}] compile+warm {time.perf_counter() - t0:.1f}s", flush=True)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, losses = step(state, None)
        float(losses["loss"])  # sync
        times.append(time.perf_counter() - t0)
    ips = imgs_per_call * args.steps / min(times)
    print(f"train [{label}] @ {H}x{W}: {ips:.1f} imgs/s", flush=True)

    if args.mfu:
        # XLA's own FLOP count for the compiled step (per dispatch)
        try:
            import jax
            jitted = getattr(step, "__wrapped__", None)
            # re-lower the real step fn for cost analysis
            if args.mode == "full" and args.spd == 1:
                inner2 = make_train_step(model, loss_fn, tx, mesh, donate=False,
                                         remat=args.remat,
                                         compiler_options=xla_opts)
                dbatch2 = tuple(shard_batch(jnp.asarray(x), mesh) for x in batch)
                cost = jax.jit(inner2).lower(state, dbatch2).compile().cost_analysis()
            else:
                print("mfu: only supported for --mode full --spd 1")
                cost = None
            if cost:
                ca = cost[0] if isinstance(cost, (list, tuple)) else cost
                flops = float(ca.get("flops", 0.0))
                tflops_s = flops * (ips / imgs_per_call) / 1e12
                print(
                    "XLA flops/step %.1f G  -> %.1f TFLOP/s  = %.1f%% of bf16 peak"
                    % (flops / 1e9, tflops_s, 100 * tflops_s / V5E_BF16_PEAK_TFLOPS),
                    flush=True,
                )
        except Exception as e:  # cost analysis is best-effort
            print("mfu unavailable: %r" % e, flush=True)


if __name__ == "__main__":
    main()
