"""Coverage for augmentation ops and LR schedules."""

import numpy as np
import pytest

from pytorchocr_tpu.data.imaug import create_operators, transform


def _rgb(h=64, w=128):
    return (np.random.RandomState(0).rand(h, w, 3) * 255).astype(np.uint8)


def test_rec_aug_runs():
    from pytorchocr_tpu.data.imaug.rec_img_aug import RecAug

    np.random.seed(0)
    aug = RecAug(use_tia=True, aug_prob=1.0)
    out = aug({"image": _rgb(48, 200)})
    assert out["image"].shape[2] == 3
    # gray input round trip
    gray = _rgb()[:, :, 0]
    out = RecAug(use_tia=False, aug_prob=1.0)({"image": gray})
    assert out["image"].ndim == 2


def test_tia_warps_shapes():
    from pytorchocr_tpu.data.imaug.text_image_aug import (
        tia_distort, tia_perspective, tia_stretch,
    )

    img = _rgb(48, 200)
    for fn in (tia_distort, tia_stretch, tia_perspective):
        out = fn(img.copy())
        assert out.shape == img.shape and out.dtype == np.uint8


def test_randaugment_and_colorjitter():
    from pytorchocr_tpu.data.imaug.color_jitter import ColorJitter
    from pytorchocr_tpu.data.imaug.randaugment import RandAugment

    np.random.seed(1)
    img = _rgb()
    out = RandAugment(prob=1.0)({"image": img.copy()})
    assert out["image"].shape == img.shape
    out = ColorJitter(brightness=0.125, saturation=0.5)({"image": img.copy()})
    assert out["image"].shape == img.shape


def test_copy_paste():
    from pytorchocr_tpu.data.imaug.copy_paste import CopyPaste

    np.random.seed(2)
    img = _rgb(200, 200)
    polys = np.array([[[10, 10], [60, 10], [60, 30], [10, 30]]], np.float32)
    ext = {
        "image": _rgb(200, 200),
        "polys": np.array([[[20, 20], [90, 20], [90, 45], [20, 45]]], np.float32),
        "ignore_tags": np.array([False]),
    }
    data = {
        "image": img,
        "polys": polys,
        "ignore_tags": np.array([False]),
        "ext_data": [ext],
    }
    out = CopyPaste()(data)
    assert out["polys"].shape[0] >= 1
    assert out["image"].shape == img.shape


def test_det_resize_for_test_variants():
    ops = create_operators(
        [{"DetResizeForTest": {"limit_side_len": 64, "limit_type": "min"}}], {}
    )
    out = transform({"image": _rgb(100, 222)}, ops)
    h, w = out["image"].shape[:2]
    assert h % 32 == 0 and w % 32 == 0 and min(h, w) >= 32
    assert out["shape"][0] == 100 and out["shape"][1] == 222

    ops = create_operators([{"DetResizeForTest": {"resize_long": 128}}], {})
    out = transform({"image": _rgb(100, 222)}, ops)
    h, w = out["image"].shape[:2]
    assert h % 128 == 0 and w % 128 == 0


def test_lr_schedules():
    from pytorchocr_tpu.optimizer.lr_scheduler import (
        WarmupCosineLR, WarmupMultiStepLR, WarmupPolyLR,
    )

    poly = WarmupPolyLR(0.1, max_iters=100, power=0.9, warmup_iters=10)
    assert float(poly(0)) == pytest.approx(0.1 / 3, rel=1e-5)  # warmup_factor 1/3
    assert float(poly(10)) == pytest.approx(0.1, rel=1e-5)
    assert float(poly(100)) == pytest.approx(0.0, abs=1e-6)
    assert float(poly(55)) == pytest.approx(0.1 * (1 - 45 / 90) ** 0.9, rel=1e-4)

    ms = WarmupMultiStepLR(0.1, milestones=[20, 40], gamma=0.1, warmup_iters=5)
    assert float(ms(10)) == pytest.approx(0.1, rel=1e-5)
    assert float(ms(25)) == pytest.approx(0.01, rel=1e-5)
    assert float(ms(45)) == pytest.approx(0.001, rel=1e-5)

    cos = WarmupCosineLR(0.1, T_max_iters=50, warmup_iters=5)
    assert float(cos(5)) == pytest.approx(0.1, rel=1e-4)
    assert float(cos(55)) == pytest.approx(0.0, abs=1e-6)


def test_training_stats_median():
    from pytorchocr_tpu.utils.stats import TrainingStats

    st = TrainingStats(window_size=3, stats_keys=["loss"])
    for v in (1.0, 100.0, 2.0):
        st.update({"loss": v})
    assert st.get()["loss"] == 2.0  # median, robust to the spike
    s = st.log({"lr": 0.01})
    assert "loss" in s and "lr" in s
