"""Standalone evaluation CLI (the reference only exposes eval inside
tools/program.py:421-473 — this makes it a first-class entry point).

Usage: python tools/eval.py -c configs/det/det_r18_db.yml \
           -o Global.checkpoints=./output/det/det_r18_db/best_accuracy
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
from pytorchocr_tpu.trainer import create_train_state, make_eval_step
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

    example_batch = next(iter(valid_dataloader))
    state = create_train_state(model, tx, rng, example_batch)
    state, _ = load_model(config, state, logger)

    eval_step = make_eval_step(model, mesh)
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


if __name__ == "__main__":
    config, rng, logger, tsb_writer = program.preprocess(is_train=False)
    main(config, rng, logger, tsb_writer)
