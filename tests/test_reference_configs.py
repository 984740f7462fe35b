"""Drop-in compatibility: the REFERENCE's own config files (unmodified,
from its checkout at /root/reference) must build every component through
this framework — model, loss, optimizer, postprocess, metric, and both
Train/Eval data-op chains.

This is the strongest form of the BASELINE "identical config-YAML
semantics" requirement: a user switching frameworks points our CLIs at
their existing YAMLs and they work.  The reference's
`character_dict_path: ./pytocr/utils/char_dict_6623.txt` resolves through
the packaged-asset fallback (pytorchocr_tpu/utils/assets.py) because the
charset files are byte-identical copies.

Skipped when the reference checkout is not mounted.
"""

import glob
import os

import pytest

from pytorchocr_tpu.data.imaug import create_operators
from pytorchocr_tpu.losses import build_loss
from pytorchocr_tpu.metrics import build_metric
from pytorchocr_tpu.modeling import build_model
from pytorchocr_tpu.optimizer import build_optimizer
from pytorchocr_tpu.postprocess import build_post_process
from pytorchocr_tpu.utils.config import load_config

REF = "/root/reference/configs"
REF_CONFIGS = sorted(glob.glob(os.path.join(REF, "**", "*.yml"), recursive=True))

pytestmark = pytest.mark.skipif(
    not REF_CONFIGS, reason="reference checkout not mounted"
)


@pytest.mark.parametrize(
    "path", REF_CONFIGS, ids=[os.path.relpath(p, REF) for p in REF_CONFIGS]
)
def test_reference_config_builds(path, tmp_path, monkeypatch):
    # chdir to an empty dir: none of the reference's relative paths
    # (./pytocr/utils/..., ./train_data/...) may be silently satisfied by
    # files of ours — only the packaged-asset fallback may resolve them.
    monkeypatch.chdir(tmp_path)
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
    for mode in ("Train", "Eval"):
        ops = create_operators(
            config[mode]["dataset"]["transforms"], config["Global"]
        )
        assert ops


def test_asset_fallback_prefers_existing_file(tmp_path):
    """resolve_dict_path must never shadow a real user-supplied dict."""
    from pytorchocr_tpu.utils.assets import resolve_dict_path

    custom = tmp_path / "char_dict_6623.txt"
    custom.write_text("a\nb\n")
    assert resolve_dict_path(str(custom)) == str(custom)
    # missing path with a packaged basename -> packaged asset
    resolved = resolve_dict_path("./pytocr/utils/char_dict_6623.txt")
    assert os.path.exists(resolved)
    assert resolved.endswith(os.path.join("utils", "char_dict_6623.txt"))
    # missing path with unknown basename -> unchanged
    assert resolve_dict_path("/nope/unknown.txt") == "/nope/unknown.txt"
    assert resolve_dict_path(None) is None
