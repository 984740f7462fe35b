"""Kernel-level backward-pass roofline for the DB-ResNet18 train step.

Round-3/4 measured train MFU at 21.3 % with the backward pass the binding
constraint (~15 % MFU; ROOFLINE.md "Training-step roofline").  This bench
answers WHERE the backward time goes and whether the ceiling is XLA's
conv-backprop lowering or this framework's graph:

1. conv micro-roofline: every distinct (shape, stride) conv class in
   DB-r18 @ 640x640 timed separately for forward, d/dinput and d/dfilter
   (each as its own jitted device fori_loop, harness.py methodology),
   with achieved TFLOP/s vs the 197 TFLOP/s bf16 peak.  The conv
   backward FLOP count equals the forward's per direction (same MACs).

2. space-to-depth stem experiment (the classic TPU ResNet fix for the
   worst kernel found by (1)): the 7x7/s2 stem on (640,640,3) is
   re-expressed as an 8x8-padded filter on a (320,320,12) space-to-depth
   input — mathematically the same function class, but stride-1 and with
   a channel count that tiles the MXU's lanes instead of C_in=3.
   Measured as fwd+bwd of stem+maxpool in both forms.

Usage: python benchmarks/bench_bwd_stages.py [--batch 16] [--iters 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

V5E_BF16_PEAK_TFLOPS = 197.0


def _timed_loop(fn, args, iters):
    """Device fori_loop timing of fn(*args)->scalar, harness methodology:
    compile+warm, then min of 3."""
    import jax
    import jax.numpy as jnp

    def loop(*a):
        def body(i, acc):
            pert = (i.astype(a[0].dtype) * jnp.asarray(1e-3, a[0].dtype))
            return acc + fn(a[0] + pert, *a[1:])

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    jitted = jax.jit(loop)
    float(jitted(*args))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jitted(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("OCR_TPU_COMPILE_CACHE", "")
    if cache_dir != "off":
        jax.config.update(
            "jax_compilation_cache_dir",
            cache_dir or os.path.expanduser("~/.cache/pytorchocr_tpu_xla"),
        )

    N = args.batch
    # every distinct conv class in DB-r18 @ 640x640 (stem + one per
    # stage: first-block stride-2 conv, steady 3x3, 1x1 downsample) plus
    # the FPN lateral and the head's first conv
    CONVS = [
        # name,              H,   W,  Cin, Cout, k, stride
        ("stem 7x7/s2",      640, 640,   3,  64, 7, 2),
        ("l1 3x3/s1",        160, 160,  64,  64, 3, 1),
        ("l2 3x3/s2",        160, 160,  64, 128, 3, 2),
        ("l2 3x3/s1",         80,  80, 128, 128, 3, 1),
        ("l3 3x3/s2",         80,  80, 128, 256, 3, 2),
        ("l3 3x3/s1",         40,  40, 256, 256, 3, 1),
        ("l4 3x3/s2",         40,  40, 256, 512, 3, 2),
        ("l4 3x3/s1",         20,  20, 512, 512, 3, 1),
        ("ds 1x1/s2 (l4)",    40,  40, 256, 512, 1, 2),
        ("fpn lat 1x1",      160, 160,  64, 256, 1, 1),
        ("head 3x3",         160, 160, 256,  64, 3, 1),
    ]

    rng = np.random.RandomState(0)
    print("conv micro-roofline, bs%d, bf16 (achieved TFLOP/s vs %.0f peak)"
          % (N, V5E_BF16_PEAK_TFLOPS))
    print("%-18s %9s %9s %9s   %6s %6s %6s  (ms/call)" % (
        "conv", "fwd", "dinput", "dfilter", "fwd%", "din%", "dfl%"))
    rows = []
    for name, H, W, cin, cout, k, s in CONVS:
        x = jnp.asarray(rng.rand(N, H, W, cin), jnp.bfloat16)
        w = jnp.asarray(rng.rand(k, k, cin, cout) * 0.1, jnp.bfloat16)
        pad = [(k // 2, k // 2)] * 2 if k > 1 else [(0, 0)] * 2
        Ho, Wo = (H + 2 * (k // 2) - k) // s + 1, (W + 2 * (k // 2) - k) // s + 1
        gflop = 2.0 * N * Ho * Wo * cout * cin * k * k / 1e9

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (s, s), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        ct = jnp.asarray(rng.rand(N, Ho, Wo, cout), jnp.bfloat16)

        # the gradient kernels in isolation, via the SAME machinery the
        # train step uses (jax.grad -> XLA's conv-backprop lowering).
        # d<conv(x,w), ct>/dx = conv_T(ct, w) does not depend on x, so the
        # fori_loop must perturb the COTANGENT ct — perturbing x (as the
        # fwd loop does) lets XLA hoist the whole gradient out of the loop
        # and time nothing (measured: exactly that, 0.000 ms).
        fwd = _timed_loop(
            lambda x, w: conv(x, w).astype(jnp.float32).mean(), (x, w),
            args.iters)
        din = _timed_loop(
            lambda ct, w: jax.grad(
                lambda xx: jnp.vdot(conv(xx, w).astype(jnp.float32),
                                    ct.astype(jnp.float32)))(x)
            .astype(jnp.float32).mean(), (ct, w), args.iters)
        dfl = _timed_loop(
            lambda ct, x_: jax.grad(
                lambda ww: jnp.vdot(conv(x_, ww).astype(jnp.float32),
                                    ct.astype(jnp.float32)))(w)
            .astype(jnp.float32).mean(), (ct, x), args.iters)
        tf = lambda t: gflop / t / 1e3
        rows.append((name, gflop, fwd, din, dfl))
        print("%-18s %8.1f %8.1f %8.1f    %5.1f %5.1f %5.1f   (%.3f/%.3f/%.3f)"
              % (name, tf(fwd), tf(din), tf(dfl),
                 100 * tf(fwd) / V5E_BF16_PEAK_TFLOPS,
                 100 * tf(din) / V5E_BF16_PEAK_TFLOPS,
                 100 * tf(dfl) / V5E_BF16_PEAK_TFLOPS,
                 fwd * 1e3, din * 1e3, dfl * 1e3))

    # ---- space-to-depth stem experiment -------------------------------
    print("\nspace-to-depth stem (stem conv + 3x3/s2 maxpool, fwd+bwd):")
    x = jnp.asarray(rng.rand(N, 640, 640, 3), jnp.bfloat16)
    w7 = jnp.asarray(rng.rand(7, 7, 3, 64) * 0.1, jnp.bfloat16)
    # 8x8 filter on the s2d-packed input == 7x7/s2 on the raw input
    # (7x7 zero-padded to 8x8, rearranged into 4x4 x (2x2x3)=12 channels)
    w8 = jnp.asarray(rng.rand(4, 4, 12, 64) * 0.1, jnp.bfloat16)

    def stem_raw(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = nn_max_pool(y)
        return y.astype(jnp.float32).mean()

    def s2d(x):
        n, h, w_, c = x.shape
        x = x.reshape(n, h // 2, 2, w_ // 2, 2, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w_ // 2, 4 * c)

    def stem_s2d(x, w):
        y = jax.lax.conv_general_dilated(
            s2d(x), w, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = nn_max_pool(y)
        return y.astype(jnp.float32).mean()

    def nn_max_pool(y):
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

    for label, fn, w in (("raw 7x7/s2", stem_raw, w7),
                         ("s2d 4x4/s1", stem_s2d, w8)):
        fwd = _timed_loop(lambda x, w, fn=fn: fn(x, w), (x, w), args.iters)
        fb = _timed_loop(
            lambda x, w, fn=fn: jax.grad(
                lambda xx: fn(xx, w))(x).astype(jnp.float32).mean()
            + jax.grad(lambda ww: fn(x, ww))(w).astype(jnp.float32).mean(),
            (x, w), args.iters)
        print("  %-12s fwd %7.3f ms   fwd+din+dfl %7.3f ms" % (
            label, fwd * 1e3, fb * 1e3))


if __name__ == "__main__":
    main()
