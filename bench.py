"""Headline benchmark: DB-ResNet18 detection forward @ 736x1280, one TPU
chip — imgs/sec/chip (BASELINE.md north-star metric).

Measures the int8 PTQ deploy configuration (the TPU-native analogue of the
reference's TensorRT low-precision engine path — deploy/onnx2trt.ipynb):
per-conv activation scales from a calibration pass, per-output-channel
weight quantization, int8 x int8 -> int32 convs on the MXU.  Accuracy vs
the float path is covered by tests/test_quant.py (and the full-resolution
det-output parity test).

Delivery design (rounds 1 and 2 both failed to land a number; this is the
third-attempt staging, headline-first):

  1. The HEADLINE graph (int8, bs128 — the one that lives in the
     persistent compile cache because every round's own runs warm it)
     compiles FIRST.  The moment one post-compile timed call exists, a
     preliminary JSON line is emitted (flushed) — from that point on the
     round has a number no matter what dies later.
  2. The min-of-N refinement then replaces it with the final line.
  3. Only if the headline phase fails does a bf16-bs128 fallback run.

There is deliberately NO cheap-looking warm-up phase before the headline:
round 2 proved the "cheap" bf16-bs16 preliminary was the cache-COLD graph
(nothing else in the repo uses that shape) and it burned 1/3 of the budget
timing out before the cache-warm headline could start.  Cache-warmth, not
graph size, decides what lands within budget through the ~30ms-RTT tunnel.

Every stage prints a "[bench  t=..s] stage" line to stderr so a timeout's
captured tail shows exactly where the budget went.

Each phase runs in a worker thread joined with a timeout (budgets
overridable via BENCH_BUDGET_S) — a plain signal.alarm cannot interrupt a
futex-parked tunnel call; a hung tunnel or slow compile forfeits only
that phase, and the last printed JSON line stands (the driver takes the
LAST line on stdout).

The TPU here is reached through a tunnel with ~30ms per-call RTT, so the
benchmark loops ITERS forwards ON DEVICE inside a single jit call (a
fori_loop whose input is perturbed per-iteration so XLA cannot hoist the
loop body) and fetches one scalar — timing measures device compute, not
tunnel latency.

Prints JSON lines of the form:
  {"metric": "det_db_r18_imgs_per_sec_736", "value": N, "unit": "imgs/s",
   "vs_baseline": N / BASELINE_TRT_FP16_FPS, "mode": ...}

BASELINE_TRT_FP16_FPS: the reference repo publishes NO speed numbers
(SURVEY.md §6).  Published DBNet-r18 TensorRT-fp16 numbers at 736px on
T4-class GPUs cluster around ~50 imgs/s, so 50.0 is used as the baseline;
the driver target is 3x => vs_baseline >= 3.0.

Measured on one v5e chip (see benchmarks/ROOFLINE.md for the bandwidth
analysis and run-to-run variance): int8 ~1050-1180 imgs/s at bs128 with
the int8 activation flow (ops/quant.py QTensor: backbone + FPN-fuse +
head IO tensors stay int8 in HBM; bs16 440 -> bs128 saturates; bs192
regresses to 989); bf16 ~830 imgs/s.
"""

import json
import os
import sys
import threading
import time

BASELINE_TRT_FP16_FPS = 50.0
H, W = 736, 1280

# Overall wall budget (s).  Kept safely under typical external timeouts so
# *we* decide what gets skipped.
TOTAL_BUDGET_S = int(os.environ.get("BENCH_BUDGET_S", "540"))

_T0 = time.monotonic()
_ABANDONED_PHASES = []  # phases whose worker thread is still wedged
_ABANDONED_THREADS = set()  # their threads: late emits must be suppressed
_INIT_LOCK = threading.Lock()  # one worker inits the shared client at a time


def _stamp(msg):
    print("[bench t=%5.1fs] %s" % (time.monotonic() - _T0, msg),
          file=sys.stderr, flush=True)


def _run_phase(budget_s, fn, name):
    """Run fn() in a daemon worker thread bounded by budget_s seconds.
    Returns (ok, result_or_message).

    A signal.alarm watchdog cannot do this job: a hung tunnel call parks
    the PJRT client on a futex and the interpreter never regains control
    to run the Python-level SIGALRM handler (same limitation the train
    loop's save-hang watchdog documents, tools/program.py).  The main
    thread joining a worker with a timeout DOES fire regardless; an
    expired worker is abandoned and main() hard-exits at the end so a
    wedged client cannot block process teardown either.  (Preliminary
    emits happen INSIDE the worker, deliberately: if the worker wedges
    after its first timed call, the preliminary line already stands.)
    """
    _stamp("phase %s start (budget %ds)" % (name, budget_s))
    result = {}

    def _worker():
        try:
            result["value"] = fn()
            result["ok"] = True
        except Exception as e:  # noqa: BLE001 — benchmark must degrade, not die
            import traceback

            traceback.print_exc(file=sys.stderr)
            result["ok"] = False
            result["value"] = e

    worker = threading.Thread(target=_worker, daemon=True)
    worker.start()
    worker.join(max(int(budget_s), 1))
    if worker.is_alive():
        _ABANDONED_PHASES.append(fn)
        _ABANDONED_THREADS.add(worker)
        _stamp("phase %s TIMED OUT" % name)
        return False, "phase timed out after %ds (worker abandoned)" % budget_s
    _stamp("phase %s done ok=%s" % (name, result.get("ok", False)))
    return result.get("ok", False), result.get("value")


def _emit(imgs_per_sec, mode):
    # a worker abandoned by its phase timeout may wake up late; its line
    # must not land AFTER the fallback's (the driver takes the LAST line)
    if threading.current_thread() in _ABANDONED_THREADS:
        _stamp("suppressed late emit (%s) from abandoned worker" % mode)
        return
    print(
        json.dumps(
            {
                "metric": "det_db_r18_imgs_per_sec_736",
                "value": round(imgs_per_sec, 2),
                "unit": "imgs/s",
                "vs_baseline": round(imgs_per_sec / BASELINE_TRT_FP16_FPS, 3),
                "mode": mode,
            }
        ),
        flush=True,
    )


def main():
    # stop any of the builder's own registered background training queues:
    # a concurrent client on the one chip skews the measurement and has
    # wedged the shared tunneled client before (see utils/bgjobs.py).
    # Registration is wired into tools/quality_queue.sh and tools/train.py
    # (OCR_TPU_REGISTER_BG=1) so every long-running chip job is covered.
    try:
        from pytorchocr_tpu.utils import bgjobs

        victims = bgjobs.reap(log=lambda m: print(m, file=sys.stderr, flush=True))
        if victims:
            time.sleep(2.0)  # let the chip's previous client actually release
    except Exception:
        pass
    _stamp("bgjobs reaped")

    import jax  # noqa: F401
    import jax.numpy as jnp

    # Persistent XLA compile cache (same policy as tools/program.py):
    # without it every bench invocation pays multi-minute cold compiles
    # through the TPU tunnel — exactly what timed out the round-1 capture.
    cache_dir = os.environ.get("OCR_TPU_COMPILE_CACHE", "")
    if cache_dir != "off":
        jax.config.update(
            "jax_compilation_cache_dir",
            cache_dir or os.path.expanduser("~/.cache/pytorchocr_tpu_xla"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from __graft_entry__ import _build_db_model
    from benchmarks.harness import measure_forward_loop
    from pytorchocr_tpu.ops import quant as quant_ops

    _stamp("imports done")

    model = _build_db_model(jnp.bfloat16)
    shared = {}  # phase 1 leaves variables here for the fallback phase

    def _init_variables():
        # jitted init: eager flax init dispatches each op through the
        # tunnel (~100s of RTTs); one traced call compiles once and hits
        # the persistent cache on reruns.  Done INSIDE the phase worker so
        # a wedged device init can only forfeit the phase, not hang main.
        # The lock serializes the check-then-set: if the int8 worker is
        # abandoned while wedged inside init, the bf16 fallback must not
        # re-enter init concurrently on the same wedged client.
        with _INIT_LOCK:
            if "variables" not in shared:
                shared["variables"] = jax.jit(
                    lambda k, x: model.init(k, x, train=False)
                )(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
                _stamp("model init done")
            return shared["variables"]

    def apply_fn(v, x):
        return model.apply(v, x, train=False)["maps"]

    def device_images(batch, seed):
        # generate inputs ON DEVICE: uploading a bs128 image tensor through
        # the tunnel costs minutes of the delivery budget and is not what
        # is being measured. bf16 feed halves HBM traffic of the input
        # (standard TPU serving practice — deploy JitRunner normalizes on
        # device anyway).
        return jax.jit(
            lambda k: jax.random.uniform(k, (batch, H, W, 3), jnp.bfloat16)
        )(jax.random.PRNGKey(seed))

    def measure(vs, batch, iters, mode):
        images = device_images(batch, seed=batch)
        _stamp("%s: inputs ready, compiling measure loop" % mode)
        elapsed = measure_forward_loop(
            apply_fn, vs, images, iters, verbose=False,
            early_cb=lambda dt: (
                _stamp("%s: first timed call %.2fs -> preliminary" % (mode, dt)),
                _emit(batch * iters / dt, mode + "-preliminary"),
            ),
        )
        return batch * iters / elapsed

    # ---- Phase 1: HEADLINE int8 bs128 (cache-warm graph goes first) ----
    def int8_phase():
        variables = _init_variables()
        calib = device_images(1, seed=7).astype(jnp.float32)
        qvariables = quant_ops.calibrate(model, variables, [calib])
        _stamp("int8 calibration done")
        with quant_ops.quantized("int8"):
            return measure(qvariables, 128, 8, "int8")

    elapsed = time.monotonic() - _T0
    headline_budget = max(int(TOTAL_BUDGET_S - elapsed - 90), 120)
    ok, res = _run_phase(headline_budget, int8_phase, "int8-headline")
    if ok:
        _emit(res, "int8")
        return
    print("int8 phase failed: %s" % res, file=sys.stderr, flush=True)

    # ---- Phase 2: bf16 bs128 fallback (only when the headline failed) ----
    remaining = TOTAL_BUDGET_S - (time.monotonic() - _T0)
    if remaining < 45:
        _stamp("budget exhausted before fallback phase")
        return
    ok, res = _run_phase(
        remaining,
        lambda: measure(_init_variables(), 128, 8, "bf16-fallback"),
        "bf16-fallback",
    )
    if ok:
        _emit(res, "bf16-fallback")


if __name__ == "__main__":
    main()
    _stamp("bench exiting (abandoned phases: %d)" % len(_ABANDONED_PHASES))
    if _ABANDONED_PHASES:
        # a wedged tunnel thread must not block interpreter teardown — the
        # printed JSON lines are the deliverable, exit with them intact
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
