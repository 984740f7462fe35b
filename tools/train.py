"""Training entry (reference tools/train.py:20-121).

Usage: python tools/train.py -c configs/rec/rec_vgg_bilstm_ctc.yml \
           -o Global.epoch_num=10
"""

import os
import sys

__dir__ = os.path.dirname(os.path.abspath(__file__))
sys.path.append(__dir__)
sys.path.append(os.path.abspath(os.path.join(__dir__, "..")))

import jax
import jax.numpy as jnp

from pytorchocr_tpu.data import build_dataloader
from pytorchocr_tpu.losses import build_loss
from pytorchocr_tpu.metrics import build_metric
from pytorchocr_tpu.modeling import build_model
from pytorchocr_tpu.optimizer import build_optimizer
from pytorchocr_tpu.parallel.mesh import create_mesh
from pytorchocr_tpu.postprocess import build_post_process
from pytorchocr_tpu.trainer import build_input_transform, create_train_state
from pytorchocr_tpu.utils.save_load import (
    load_backbone_pretrained,
    load_model,
    load_submodel_pretrained,
)
import program


def main(config, rng, logger, tsb_writer):
    global_config = config["Global"]

    train_dataloader, _ = build_dataloader(
        config, "Train", logger, seed=global_config.get("seed")
    )
    if len(train_dataloader) == 0:
        logger.error(
            "No Images in train dataset, please ensure\n"
            "\t1. The images num in the train label_file_list should be "
            "larger than or equal with batch size.\n"
            "\t2. The annotation file and path in the configuration file "
            "are provided normally."
        )
        return

    valid_dataloader = None
    if config.get("Eval"):
        valid_dataloader, _ = build_dataloader(
            config, "Eval", logger, seed=global_config.get("seed")
        )

    # postprocess FIRST: the charset length feeds Head.out_channels
    # (reference tools/train.py:42-53)
    post_process_class = build_post_process(config["PostProcess"], global_config)
    if hasattr(post_process_class, "character"):
        char_num = len(getattr(post_process_class, "character"))
        if config["Architecture"]["algorithm"] in ["Distillation"]:
            for key in config["Architecture"]["Models"]:
                config["Architecture"]["Models"][key]["Head"]["out_channels"] = char_num
        else:
            config["Architecture"]["Head"]["out_channels"] = char_num

    # bf16 compute policy: TPU-native mixed precision (replaces apex AMP)
    dtype = jnp.bfloat16 if global_config.get("use_amp", False) else jnp.float32
    model = build_model(config["Architecture"], dtype=dtype)

    loss_class = build_loss(config["Loss"])

    tx, lr_schedule = build_optimizer(
        config["Optimizer"],
        epochs=global_config["epoch_num"],
        step_each_epoch=len(train_dataloader),
    )

    mesh = create_mesh()

    # init state from one example batch
    example_batch = next(iter(train_dataloader))
    state = create_train_state(
        model, tx, rng, example_batch,
        input_transform=build_input_transform(
            global_config.get("_device_normalize_spec", {}).get("Train")
        ),
    )

    # ImageNet backbone init first, then per-submodel (teacher) checkpoints,
    # then resume/finetune checkpoints on top
    state = load_backbone_pretrained(state, config["Architecture"], logger)
    state = load_submodel_pretrained(state, config["Architecture"], logger)
    state, global_state = load_model(config, state, logger)

    logger.info("train dataloader has {} iters".format(len(train_dataloader)))
    if valid_dataloader is not None:
        logger.info("valid dataloader has {} iters".format(len(valid_dataloader)))

    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    logger.info("model parameters: {:.2f}M".format(n_params / 1e6))

    eval_class = build_metric(config["Metric"])

    program.train(
        config,
        mesh,
        train_dataloader,
        valid_dataloader,
        model,
        loss_class,
        tx,
        lr_schedule,
        state,
        global_state,
        post_process_class,
        eval_class,
        logger,
        tsb_writer,
    )


if __name__ == "__main__":
    if os.environ.get("OCR_TPU_REGISTER_BG"):
        # Benchmark isolation (utils/bgjobs.py): background quality-queue
        # trainings self-register so bench.py / the driver's entry()
        # compile-check reap them before touching the single shared chip.
        from pytorchocr_tpu.utils import bgjobs

        bgjobs.register(os.getpid())
    config, rng, logger, tsb_writer = program.preprocess(is_train=True)
    main(config, rng, logger, tsb_writer)
