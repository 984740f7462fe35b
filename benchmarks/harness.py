"""Shared throughput-measurement harness for the bench scripts.

Methodology (single source of truth — bench.py and benchmarks/bench_* all
delegate here): run ITERS forwards ON DEVICE inside one jitted
`lax.fori_loop` whose input is perturbed per iteration (so XLA cannot hoist
the body), fetch a single scalar, and take the min of 3 timed calls after a
compile+warm call.  This amortizes away the tunnel's per-dispatch RTT and
measures device compute.
"""

import time


def measure_forward_loop(apply_fn, variables, images, iters, verbose=True,
                         early_cb=None):
    """apply_fn(variables, x) -> array.  Returns seconds for `iters` apps.

    The perturbation adds i*1e-3 in the input dtype, defeating loop-
    invariant hoisting without changing the compute profile.

    ``early_cb``: optional callable invoked with the elapsed seconds of the
    FIRST post-compile warm call — lets a delivery-critical caller emit a
    preliminary number the moment a usable timing exists, before the
    min-of-3 refinement (bench.py's timeout insurance).
    """
    import jax
    import jax.numpy as jnp

    def forward_loop(variables, images):
        def body(i, acc):
            x = images + (i.astype(images.dtype) * jnp.asarray(1e-3, images.dtype))
            y = apply_fn(variables, x)
            return acc + y.astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    jitted = jax.jit(forward_loop)
    t0 = time.perf_counter()
    float(jitted(variables, images))
    if verbose:
        print(f"compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    # the warm call feeds early_cb only — it is NOT a timed sample, so the
    # published number stays "min of 3 timed calls after compile+warm"
    # (the documented methodology above)
    start = time.perf_counter()
    float(jitted(variables, images))
    warm_elapsed = time.perf_counter() - start
    if early_cb is not None:
        early_cb(warm_elapsed)
    times = []
    for _ in range(3):
        start = time.perf_counter()
        float(jitted(variables, images))
        times.append(time.perf_counter() - start)
    return min(times)
