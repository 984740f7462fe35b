"""Detection forward throughput (DB-ResNet18 @ 736x1280, one chip).

Measures device compute only via benchmarks/harness.py (the shared
methodology behind the README numbers and the repo-root `bench.py`
headline).

Usage:
    python benchmarks/bench_det.py --batch 128 --mode bf16
    python benchmarks/bench_det.py --batch 128 --mode int8   # PTQ path
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

H, W = 736, 1280
ITERS = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--mode", choices=["bf16", "int8"], default="bf16")
    ap.add_argument("--iters", type=int, default=ITERS)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_db_model
    from pytorchocr_tpu.ops import quant as quant_ops

    model = _build_db_model(jnp.bfloat16)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(args.batch, H, W, 3).astype(np.float32)).astype(
        jnp.bfloat16
    )
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    if args.mode == "int8":
        # per-conv activation scales from a small calibration batch
        calib = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
        variables = quant_ops.calibrate(model, variables, [calib])

    from harness import measure_forward_loop

    apply_fn = lambda v, x: model.apply(v, x, train=False)["maps"]
    if args.mode == "int8":
        with quant_ops.quantized("int8"):
            elapsed = measure_forward_loop(apply_fn, variables, images, args.iters)
    else:
        elapsed = measure_forward_loop(apply_fn, variables, images, args.iters)
    ips = args.batch * args.iters / elapsed
    print(f"det {args.mode} bs{args.batch} @ {H}x{W}: {ips:.1f} imgs/s", flush=True)


if __name__ == "__main__":
    main()
