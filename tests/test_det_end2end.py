"""DB detection vertical slice: synthetic scenes -> det imaug chain (GT
shrink/border maps, pyclipper-free) -> ResNet18+FPN+DBHead -> DBLoss (OHEM)
-> sharded train steps -> DBPostProcess box extraction -> DetMetric."""

import numpy as np

import jax
import jax.numpy as jnp

from pytorchocr_tpu.data import build_dataloader
from pytorchocr_tpu.losses import build_loss
from pytorchocr_tpu.metrics import build_metric
from pytorchocr_tpu.modeling import build_model
from pytorchocr_tpu.optimizer import build_optimizer
from pytorchocr_tpu.parallel.mesh import create_mesh, shard_batch
from pytorchocr_tpu.postprocess import build_post_process
from pytorchocr_tpu.trainer import create_train_state, make_eval_step, make_train_step
from pytorchocr_tpu.utils import get_logger
from pytorchocr_tpu.utils.config import _to_attrdict

from synth import make_det_dataset


def det_config(label_file):
    return _to_attrdict(
        {
            "Global": {"distributed": False, "seed": 3},
            "Architecture": {
                "model_type": "det",
                "algorithm": "DB",
                "Transform": None,
                "Backbone": {"name": "ResNet", "layers": 18},
                "Neck": {"name": "FPN", "out_channels": 64, "mode": "DB"},
                "Head": {"name": "DBHead", "k": 50},
            },
            "Loss": {
                "name": "DBLoss",
                "balance_loss": True,
                "main_loss_type": "BCELoss",
                "alpha": 1,
                "beta": 10,
                "ohem_ratio": 3,
            },
            "Optimizer": {
                "base_lr": 0.001,
                "optim": {"name": "Adam", "amsgrad": True},
                "lr_decay": {"name": "WarmupPolyLR", "warmup_epoch": 1, "power": 0.9},
            },
            "PostProcess": {
                "name": "DBPostProcess",
                "thresh": 0.3,
                "box_thresh": 0.5,
                "max_candidates": 1000,
                "unclip_ratio": 1.5,
                "score_mode": "poly",
            },
            "Metric": {"name": "DetMetric", "main_indicator": "hmean"},
            "Train": {
                "dataset": {
                    "name": "SimpleDataSet",
                    "label_file_list": [label_file],
                    "transforms": [
                        {"DecodeImage": {"img_mode": "RGB"}},
                        {"DetLabelEncode": {"ignore_txt": ["###"]}},
                        {"IaaAugment": {"augmenter_args": [
                            {"type": "Fliplr", "args": {"p": 0.5}},
                            {"type": "Affine", "args": {"rotate": [-10, 10]}},
                            {"type": "Resize", "args": {"size": [0.8, 1.2]}},
                        ]}},
                        {"EastRandomCropData": {"size": [256, 256], "max_tries": 10, "keep_ratio": True}},
                        {"MakeBorderMap": {"shrink_ratio": 0.4, "thresh_min": 0.3, "thresh_max": 0.7}},
                        {"MakeShrinkMap": {"shrink_ratio": 0.4, "min_text_size": 8}},
                        {"ToTensor": None},
                        {"Normalize": {"mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225]}},
                        {"KeepKeys": {"keep_keys": ["image", "threshold_map", "threshold_mask", "shrink_map", "shrink_mask"]}},
                    ],
                },
                "loader": {"shuffle": True, "batch_size_per_card": 8, "drop_last": True, "num_workers": 2},
            },
            "Eval": {
                "dataset": {
                    "name": "SimpleDataSet",
                    "label_file_list": [label_file],
                    "transforms": [
                        {"DecodeImage": {"img_mode": "RGB"}},
                        {"DetLabelEncode": {"ignore_txt": ["###"]}},
                        {"DetResizeForTest": {"image_shape": [256, 256]}},
                        {"ToTensor": None},
                        {"Normalize": {"mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225]}},
                        {"KeepKeys": {"keep_keys": ["image", "shape", "polys", "ignore_tags"]}},
                    ],
                },
                "loader": {"shuffle": False, "batch_size_per_card": 1, "drop_last": False, "num_workers": 1},
            },
        }
    )


def test_det_gt_maps(tmp_path):
    label_file = make_det_dataset(str(tmp_path))
    config = det_config(label_file)
    logger = get_logger("test_det_gt")
    loader, _ = build_dataloader(config, "Train", logger, seed=3)
    batch = next(iter(loader))
    image, tmap, tmask, smap, smask = batch
    assert image.shape == (8, 256, 256, 3)
    assert tmap.shape == smap.shape == (8, 256, 256)
    # threshold map values live in [thresh_min, thresh_max]
    assert tmap.min() >= 0.3 - 1e-5 and tmap.max() <= 0.7 + 1e-5
    assert set(np.unique(smap)).issubset({0.0, 1.0})
    # at least one sample must have positive shrink pixels
    assert smap.sum() > 0


def test_db_train_and_postprocess(tmp_path):
    label_file = make_det_dataset(str(tmp_path))
    config = det_config(label_file)
    logger = get_logger("test_det")

    train_loader, _ = build_dataloader(config, "Train", logger, seed=3)
    model = build_model(config["Architecture"])
    loss_fn = build_loss(config["Loss"])
    tx, _ = build_optimizer(config["Optimizer"], epochs=2, step_each_epoch=len(train_loader))
    mesh = create_mesh()

    batches = list(train_loader)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batches[0])
    train_step = make_train_step(model, loss_fn, tx, mesh)

    for i in range(3):
        b = batches[i % len(batches)]
        device_b = tuple(shard_batch(jnp.asarray(x), mesh) for x in b)
        state, losses = train_step(state, device_b)
        assert np.isfinite(float(losses["loss"]))
        for k in ("loss_shrink_maps", "loss_threshold_maps", "loss_binary_maps"):
            assert np.isfinite(float(losses[k]))

    # eval path on a batch-1 resized image
    eval_loader, _ = build_dataloader(config, "Eval", logger, seed=3)
    eval_step = make_eval_step(model, mesh)
    post = build_post_process(config["PostProcess"], config["Global"])
    metric = build_metric(config["Metric"])

    eb = next(iter(eval_loader))
    preds = eval_step(state.params, state.batch_stats, jnp.asarray(eb[0]))
    assert preds["maps"].shape == (1, 256, 256, 1)
    post_result = post(preds, eb[1])
    assert isinstance(post_result, list) and "points" in post_result[0]
    metric(post_result, eb)
    out = metric.get_metric()
    assert set(out) == {"precision", "recall", "hmean"}


def test_db_postprocess_golden_box():
    """A clean synthetic prob map must produce one box around the blob,
    expanded by the unclip ratio."""
    from pytorchocr_tpu.postprocess.db_postprocess import DBPostProcess

    prob = np.zeros((1, 160, 160, 1), dtype=np.float32)
    prob[0, 60:100, 40:120, 0] = 0.9
    post = DBPostProcess(thresh=0.3, box_thresh=0.5, unclip_ratio=1.5, score_mode="box")
    shape_list = [[160, 160, 1.0, 1.0]]
    res = post({"maps": prob}, shape_list)
    boxes = res[0]["points"]
    assert len(boxes) == 1
    box = boxes[0]
    # unclip distance for 80x40 rect @1.5: A*r/L = 3200*1.5/240 = 20
    xs, ys = box[:, 0], box[:, 1]
    assert 15 <= xs.min() <= 25 and 135 <= xs.max() <= 145
    assert 35 <= ys.min() <= 45 and 115 <= ys.max() <= 125
    assert res[0]["scores"][0] > 0.85
