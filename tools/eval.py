"""Standalone evaluation CLI (the reference only exposes eval inside
tools/program.py:421-473 — this makes it a first-class entry point).

Usage: python tools/eval.py -c configs/det/det_r18_db.yml \
           -o Global.checkpoints=./output/det/det_r18_db/best_accuracy

int8 PTQ evaluation (quality counterpart of the TensorRT-int8 engine the
reference builds in deploy/onnx2trt.ipynb — here the SAME eval pipeline
runs with int8 MXU convs so the metric delta vs bf16 is directly
comparable):

    python tools/eval.py -c ... -o Global.checkpoints=... \
        Global.quant=true [Global.quant_calib_n=8]

Calibration uses the first ``quant_calib_n`` eval batches (activation
absmax running max — ops/quant.py:calibrate).
"""

import os
import sys

__dir__ = os.path.dirname(os.path.abspath(__file__))
sys.path.append(__dir__)
sys.path.append(os.path.abspath(os.path.join(__dir__, "..")))

import jax
import jax.numpy as jnp

from pytorchocr_tpu.data import build_dataloader
from pytorchocr_tpu.metrics import build_metric
from pytorchocr_tpu.modeling import build_model
from pytorchocr_tpu.optimizer import build_optimizer
from pytorchocr_tpu.parallel.mesh import create_mesh
from pytorchocr_tpu.postprocess import build_post_process
from pytorchocr_tpu.trainer import (
    build_input_transform,
    create_train_state,
    make_eval_step,
)
from pytorchocr_tpu.utils.save_load import load_model
import program


def main(config, rng, logger, tsb_writer):
    global_config = config["Global"]
    valid_dataloader, _ = build_dataloader(
        config, "Eval", logger, seed=global_config.get("seed")
    )
    post_process_class = build_post_process(config["PostProcess"], global_config)
    if hasattr(post_process_class, "character"):
        char_num = len(getattr(post_process_class, "character"))
        if config["Architecture"]["algorithm"] in ["Distillation"]:
            for key in config["Architecture"]["Models"]:
                config["Architecture"]["Models"][key]["Head"]["out_channels"] = char_num
        else:
            config["Architecture"]["Head"]["out_channels"] = char_num

    dtype = jnp.bfloat16 if global_config.get("use_amp", False) else jnp.float32
    model = build_model(config["Architecture"], dtype=dtype)
    tx, _ = build_optimizer(config["Optimizer"], epochs=1, step_each_epoch=1)
    mesh = create_mesh()

    input_transform = build_input_transform(
        global_config.get("_device_normalize_spec", {}).get("Eval")
    )
    example_batch = next(iter(valid_dataloader))
    state = create_train_state(
        model, tx, rng, example_batch, input_transform=input_transform
    )
    state, _ = load_model(config, state, logger)

    if global_config.get("quant", False):
        from pytorchocr_tpu.ops import quant as quant_ops

        calib_n = int(global_config.get("quant_calib_n", 8))
        calib = []
        for i, b in enumerate(valid_dataloader):
            img = jnp.asarray(b[0])
            if input_transform is not None:
                img = input_transform(img)
            calib.append(img)
            if i + 1 >= calib_n:
                break
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logger.info("int8 PTQ: calibrating on %d eval batches", len(calib))
        qvars = quant_ops.calibrate(model, variables, calib)["quant"]

        def eval_fn(params, batch_stats, images):
            if input_transform is not None:
                images = input_transform(images)
            vs = {"params": params, "quant": qvars}
            if batch_stats:
                vs["batch_stats"] = batch_stats
            return model.apply(vs, images, train=False)

        eval_step = quant_ops.quant_jit(eval_fn)
        quant_ctx = quant_ops.quantized("int8")
    else:
        import contextlib

        eval_step = make_eval_step(model, mesh, input_transform=input_transform)
        quant_ctx = contextlib.nullcontext()
    with quant_ctx:
        metric = program.evaluate(
            state,
            eval_step,
            mesh,
            valid_dataloader,
            post_process_class,
            build_metric(config["Metric"]),
            config["Architecture"].get("model_type"),
        )
    logger.info(
        "metric eval ***************\n%s",
        "\n".join("{}: {}".format(k, v) for k, v in metric.items()),
    )

    # Artifact of record: Global.metric_json=path writes the metric dict +
    # provenance as JSON so published QUALITY.md rows stay auditable
    # without retraining (the quality queue sets this per run).
    metric_json = global_config.get("metric_json")
    if metric_json:
        import datetime
        import json

        payload = {
            "metric": {k: (float(v) if hasattr(v, "__float__") else v)
                       for k, v in metric.items()},
            "config": global_config.get("_config_path"),
            "checkpoints": global_config.get("checkpoints"),
            "quant": bool(global_config.get("quant", False)),
            "eval_label_file_list": config.get("Eval", {})
            .get("dataset", {}).get("label_file_list"),
            "timestamp": datetime.datetime.now().isoformat(timespec="seconds"),
        }
        os.makedirs(os.path.dirname(metric_json) or ".", exist_ok=True)
        with open(metric_json, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        logger.info("metric json written to %s", metric_json)


if __name__ == "__main__":
    if os.environ.get("OCR_TPU_REGISTER_BG"):
        # Benchmark isolation (utils/bgjobs.py): see tools/train.py.
        from pytorchocr_tpu.utils import bgjobs

        bgjobs.register(os.getpid())
    config, rng, logger, tsb_writer = program.preprocess(is_train=False)
    main(config, rng, logger, tsb_writer)
