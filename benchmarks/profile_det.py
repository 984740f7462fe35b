"""Component-wise time split of the headline det forward (VERDICT r1 #4).

jax.profiler traces through the tunnel are awkward to fetch, so this
measures the split directly: jit partial pipelines (backbone; +FPN; +head
conv1; full) with the same on-device fori_loop harness as bench.py and
difference the times. Prints a table plus the implied stage shares for
bf16 and int8 at the headline batch/resolution.

Usage: python benchmarks/profile_det.py [--batch 128] [--iters 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

H, W = 736, 1280


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--modes", default="bf16,int8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_db_model
    from benchmarks.harness import measure_forward_loop
    from pytorchocr_tpu.ops import quant as quant_ops

    model = _build_db_model(jnp.bfloat16)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(args.batch, H, W, 3).astype(np.float32)
    ).astype(jnp.bfloat16)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )

    # partial applies via flax module method targeting
    def backbone_only(v, x):
        feats = model.apply(v, x, train=False,
                            method=lambda m, x, train: m.backbone(x, train=train))
        return feats[-1]

    def through_neck(v, x):
        def fn(m, x, train):
            feats = m.backbone(x, train=train)
            return m.neck(feats, train=train)

        return model.apply(v, x, train=False, method=fn)

    def full(v, x):
        return model.apply(v, x, train=False)["maps"]

    stages = [("backbone", backbone_only), ("backbone+fpn", through_neck),
              ("full", full)]

    results = {}
    for mode in args.modes.split(","):
        vs = variables
        ctx_mode = None
        if mode == "int8":
            calib = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
            vs = quant_ops.calibrate(model, variables, [calib])
            ctx_mode = "int8"
        times = {}
        for name, fn in stages:
            t0 = time.time()
            if ctx_mode:
                with quant_ops.quantized(ctx_mode):
                    elapsed = measure_forward_loop(fn, vs, images, args.iters,
                                                   verbose=False)
            else:
                elapsed = measure_forward_loop(fn, vs, images, args.iters,
                                               verbose=False)
            per_img_ms = elapsed / (args.batch * args.iters) * 1e3
            times[name] = per_img_ms
            print("%s %-14s %7.3f ms/img  (compile+run %.0fs)"
                  % (mode, name, per_img_ms, time.time() - t0), flush=True)
        results[mode] = times

    for mode, times in results.items():
        bb = times["backbone"]
        neck = times["backbone+fpn"] - bb
        head = times["full"] - times["backbone+fpn"]
        total = times["full"]
        print(
            "%s split: backbone %.3f (%.0f%%) | fpn %.3f (%.0f%%) | head %.3f "
            "(%.0f%%) | total %.3f ms/img => %.1f imgs/s"
            % (mode, bb, 100 * bb / total, neck, 100 * neck / total,
               head, 100 * head / total, total, 1e3 / total),
            flush=True,
        )


if __name__ == "__main__":
    main()
