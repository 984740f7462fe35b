"""On-device DB postprocess front-half cost on realistic text layouts.

db_front_half (threshold -> connected-component labeling -> per-component
score/bbox segment reductions) runs a fixpoint label propagation whose cost
scales with the DIAMETER of the largest component, not the map size — a
prob map that thresholds to one giant blob (e.g. random noise) is the
pathological worst case (~94 ms/img at 736x1280), while real detection
maps (text-word-sized components) converge in a few propagation calls.

This bench builds maps with `--boxes` word-like rectangles (default 20
boxes of ~32x200 px, ICDAR-ish) and times the jitted front half per image.

Usage: python benchmarks/bench_postprocess.py [--boxes 20] [--iters 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

H, W = 736, 1280


def synth_prob_map(rng, n_boxes):
    """Word-like rectangles with soft edges on a low-probability background."""
    prob = rng.rand(H, W).astype(np.float32) * 0.15
    for _ in range(n_boxes):
        bh = rng.randint(16, 48)
        bw = rng.randint(60, 360)
        y = rng.randint(0, H - bh)
        x = rng.randint(0, W - bw)
        prob[y : y + bh, x : x + bw] = 0.6 + 0.4 * rng.rand(bh, bw)
    return prob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--boxes", type=int, default=20)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pytorchocr_tpu.ops.cc_label import db_front_half

    rng = np.random.RandomState(0)
    prob = jnp.asarray(synth_prob_map(rng, args.boxes))

    @jax.jit
    def front(p, i):
        # perturb below threshold sensitivity so XLA cannot hoist
        out = db_front_half(p + i * 1e-6, thresh=0.3)
        return out["score"].sum() + out["count"].sum() + out["num"]

    t0 = time.perf_counter()
    float(front(prob, jnp.float32(0)))
    print(f"compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    times = []
    for k in range(args.iters):
        t0 = time.perf_counter()
        float(front(prob, jnp.float32(k + 1)))
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1000
    print(
        f"db_front_half {args.boxes} boxes @ {H}x{W}: {ms:.1f} ms/img "
        f"(includes ~30ms tunnel RTT in this environment)",
        flush=True,
    )


if __name__ == "__main__":
    main()
