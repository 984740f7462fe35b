"""CRNN recognition forward throughput (VGG + 2xBiLSTM + CTC-6624 @ 32x320).

Same on-device-loop methodology (benchmarks/harness.py); reports
text-lines/sec.

Usage:
    python benchmarks/bench_rec.py --batch 512 --mode bf16
    python benchmarks/bench_rec.py --batch 512 --mode int8
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

H, W = 32, 320
ITERS = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--mode", choices=["bf16", "int8"], default="bf16")
    ap.add_argument("--iters", type=int, default=ITERS)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pytorchocr_tpu.modeling import build_model
    from pytorchocr_tpu.ops import quant as quant_ops

    cfg = {
        "model_type": "rec",
        "algorithm": "CRNN",
        "Transform": None,
        "Backbone": {
            "name": "VGG",
            "model_name": "v1",
            "scale": 1.0,
            "input_channel": 1,
        },
        "Neck": {"name": "SequenceEncoder", "encoder_type": "rnn", "hidden_size": 256},
        "Head": {"name": "CTCHead", "out_channels": 6624},
    }
    model = build_model(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(args.batch, H, W, 1).astype(np.float32)).astype(
        jnp.bfloat16
    )
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, 64, 1))
    )
    if args.mode == "int8":
        calib = jnp.asarray(rng.rand(4, H, W, 1).astype(np.float32))
        variables = quant_ops.calibrate(model, variables, [calib])

    from harness import measure_forward_loop

    apply_fn = lambda v, x: model.apply(v, x, train=False)
    if args.mode == "int8":
        with quant_ops.quantized("int8"):
            elapsed = measure_forward_loop(apply_fn, variables, images, args.iters)
    else:
        elapsed = measure_forward_loop(apply_fn, variables, images, args.iters)
    lps = args.batch * args.iters / elapsed
    print(f"rec {args.mode} bs{args.batch} @ {H}x{W}: {lps:.0f} lines/s", flush=True)


if __name__ == "__main__":
    main()
