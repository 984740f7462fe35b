"""Every shipped config must build its model, loss, optimizer, postprocess
and metric (config-to-components parity check)."""

import glob
import os

import pytest

from pytorchocr_tpu.losses import build_loss
from pytorchocr_tpu.metrics import build_metric
from pytorchocr_tpu.modeling import build_model
from pytorchocr_tpu.optimizer import build_optimizer
from pytorchocr_tpu.postprocess import build_post_process
from pytorchocr_tpu.utils.config import load_config

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "**", "*.yml"), recursive=True))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.relpath(p, REPO) for p in CONFIGS])
def test_config_builds(path, monkeypatch):
    monkeypatch.chdir(REPO)
    config = load_config(path)
    post = build_post_process(config["PostProcess"], config["Global"])
    if hasattr(post, "character"):
        char_num = len(post.character)
        if config["Architecture"]["algorithm"] in ["Distillation"]:
            for key in config["Architecture"]["Models"]:
                config["Architecture"]["Models"][key]["Head"]["out_channels"] = char_num
        else:
            config["Architecture"]["Head"]["out_channels"] = char_num
    model = build_model(config["Architecture"])
    assert model is not None
    loss = build_loss(config["Loss"])
    assert callable(loss)
    tx, sched = build_optimizer(config["Optimizer"], epochs=2, step_each_epoch=10)
    assert tx is not None and callable(sched)
    metric = build_metric(config["Metric"])
    assert hasattr(metric, "main_indicator")
