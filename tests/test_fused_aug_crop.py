"""FusedDetAugCrop vs the [IaaAugment, EastRandomCropData] chain.

The fused op must reproduce the chain's polygon geometry exactly when
both consume the same sampled parameters (the image differs only by
resampling quality: one bilinear pass instead of three), and must be
substantially cheaper per sample.
"""

import random

import numpy as np

from pytorchocr_tpu.data.imaug import (
    EastRandomCropData,
    FusedDetAugCrop,
    IaaAugment,
)


def _scene(seed=0, h=480, w=640, n=5):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    polys, texts, tags = [], [], []
    for i in range(n):
        x0 = rng.randint(0, w - 120)
        y0 = rng.randint(0, h - 60)
        bw, bh = rng.randint(40, 110), rng.randint(16, 40)
        polys.append([[x0, y0], [x0 + bw, y0], [x0 + bw, y0 + bh], [x0, y0 + bh]])
        texts.append("t%d" % i)
        tags.append(False)
    return {
        "image": img,
        "polys": np.array(polys, np.float32),
        "texts": texts,
        "ignore_tags": tags,
    }


def test_fused_poly_geometry_matches_chain():
    """Same python-random stream => same flip/rotate/scale draws and same
    crop selection => identical output polys and identical image shape."""
    chain = [
        IaaAugment(augmenter_args=[
            {"type": "Fliplr", "args": {"p": 0.5}},
            {"type": "Affine", "args": {"rotate": [-10, 10]}},
            {"type": "Resize", "args": {"size": [0.5, 3]}},
        ]),
        EastRandomCropData(size=[256, 256], max_tries=20, keep_ratio=True),
    ]
    fused = FusedDetAugCrop(
        flip_p=0.5, rotate=[-10, 10], scale=[0.5, 3],
        size=[256, 256], max_tries=20, keep_ratio=True,
    )
    for seed in range(8):
        data_a = _scene(seed)
        data_b = {k: (v.copy() if isinstance(v, np.ndarray) else list(v))
                  for k, v in _scene(seed).items()}
        random.seed(seed)
        np.random.seed(seed)
        for op in chain:
            data_a = op(data_a)
        random.seed(seed)
        np.random.seed(seed)
        data_b = fused(data_b)
        assert data_a["image"].shape == data_b["image"].shape
        assert data_a["polys"].shape == data_b["polys"].shape, seed
        if data_a["polys"].size:
            np.testing.assert_allclose(
                data_a["polys"], data_b["polys"], atol=1e-3, err_msg=str(seed)
            )
        assert data_a["texts"] == data_b["texts"]
        assert data_a["ignore_tags"] == data_b["ignore_tags"]


def test_fused_output_feeds_gt_makers():
    from pytorchocr_tpu.data.imaug import MakeBorderMap, MakeShrinkMap

    fused = FusedDetAugCrop(size=[320, 320], max_tries=10)
    random.seed(3)
    np.random.seed(3)
    data = fused(_scene(3))
    data = MakeBorderMap(shrink_ratio=0.4)(data)
    data = MakeShrinkMap(shrink_ratio=0.4, min_text_size=8)(data)
    assert data["threshold_map"].shape == (320, 320)
    assert data["shrink_map"].shape == (320, 320)


def test_fused_is_faster_than_chain():
    import time

    chain = [IaaAugment(), EastRandomCropData(size=[640, 640], max_tries=20)]
    fused = FusedDetAugCrop(size=[640, 640], max_tries=20)
    data = _scene(1, h=720, w=960)

    def run(op_list, seed):
        random.seed(seed)
        np.random.seed(seed)
        d = {k: (v.copy() if isinstance(v, np.ndarray) else list(v))
             for k, v in _scene(1, h=720, w=960).items()}
        for op in op_list:
            d = op(d)
        return d

    t0 = time.perf_counter()
    for s in range(10):
        run(chain, s)
    t_chain = time.perf_counter() - t0
    t0 = time.perf_counter()
    for s in range(10):
        run([fused], s)
    t_fused = time.perf_counter() - t0
    # generous bound: the fused path must at least halve the aug cost
    assert t_fused < t_chain * 0.6, (t_fused, t_chain)
