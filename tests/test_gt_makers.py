"""Golden-property tests for the PSE/PAN ground-truth makers.

Reference contracts: make_pse_gt.py (7 progressively shrunk kernels,
rate = 1 - (1-min_ratio)/(n-1)*i) and make_pan_gt.py (text + single shrunk
kernel + instance map).  The rebuild rasterizes shrunk polygons via exact
distance-transform erosion instead of pyclipper; these tests pin the output
contract and the geometry semantics that the losses depend on.
"""

import numpy as np

from pytorchocr_tpu.data.imaug.make_pse_gt import MakePseGt
from pytorchocr_tpu.data.imaug.make_pan_gt import MakePanGt


def _data(h=80, w=120, size=64):
    polys = np.array(
        [
            [[10, 10], [50, 10], [50, 30], [10, 30]],  # instance 1
            [[60, 45], [110, 45], [110, 70], [60, 70]],  # instance 2
        ],
        np.float32,
    )
    return {
        "image": np.zeros((h, w, 3), np.uint8),
        "polys": polys.copy(),
        "ignore_tags": [False, False],
    }


def test_pse_gt_contract_and_nesting():
    op = MakePseGt(kernel_num=7, size=64, min_shrink_ratio=0.4)
    out = op(_data())
    assert out["gt_text"].shape == out["mask"].shape
    assert out["gt_kernels"].shape[0] == 6  # kernel_num - 1 shrunk maps
    assert set(np.unique(out["gt_text"])) <= {0.0, 1.0}
    # progressive shrink: each kernel is a subset of the previous one and
    # strictly smaller in area (rate decreases 1.0 -> min_shrink_ratio)
    prev = out["gt_text"]
    for k in out["gt_kernels"]:
        assert (k <= prev + 1e-6).all(), "kernel escapes its parent"
        assert k.sum() < prev.sum()
        prev = k
    # smallest kernel still covers both instance centers (short edge 80 >=
    # size 64, so no rescale happens and coords are unchanged)
    smallest = out["gt_kernels"][-1]
    assert smallest[20, 30] == 1
    assert smallest[57, 85] == 1
    assert out["mask"].min() == 1.0  # nothing ignored


def test_pse_gt_shrink_distance_matches_formula():
    """Kernel area tracks the reference shrink formula
    d = area*(1-r^2)/perimeter: an axis-aligned rectangle eroded by d has
    area (W-2d)(H-2d)."""
    poly = np.array([[[8, 8], [88, 8], [88, 48], [8, 48]]], np.float32)
    rate = 0.6
    kernel, _ = MakePseGt.generate_kernel((64, 96), rate, poly, [False])
    area, perim = 80 * 40, 2 * (80 + 40)
    d = area * (1 - rate * rate) / perim
    expect = (80 - 2 * d) * (40 - 2 * d)
    got = (kernel > 0).sum()
    assert abs(got - expect) / expect < 0.15  # raster tolerance


def test_pse_gt_ignore_tag_zeroes_mask():
    data = _data()
    data["ignore_tags"] = [False, True]
    out = MakePseGt(kernel_num=3, size=64)(data)
    # ignored poly region masked out, kept poly still trainable
    assert out["mask"][57, 85] == 0.0
    assert out["mask"][20, 30] == 1.0


def test_pan_gt_contract_instances_and_kernel():
    out = MakePanGt(size=64, min_shrink_ratio=0.5)(_data())
    inst = out["gt_instance"]
    a = inst[20, 30]
    b = inst[57, 85]
    assert a == 1 and b == 2  # instance ids are poly order + 1
    # text map = union of instances; kernel nested strictly inside text
    assert set(np.unique(out["gt_text"])) <= {0.0, 1.0}
    assert ((inst > 0) == (out["gt_text"] > 0)).all()
    assert (out["gt_kernels"] <= out["gt_text"] + 1e-6).all()
    assert 0 < out["gt_kernels"].sum() < out["gt_text"].sum()


def test_pan_gt_upscales_short_edge():
    """Images below `size` are upscaled so the short edge reaches it, and
    polys scale with the image (reference make_pan_gt behavior)."""
    data = _data(h=32, w=48)
    out = MakePanGt(size=64)(data)
    assert min(out["image"].shape[:2]) == 64
    assert np.allclose(out["polys"], _data()["polys"] * 2.0)


def test_pse_gt_shared_field_matches_per_rate_rasterization():
    """The shared-distance-field fast path must reproduce the per-rate
    generate_kernel rasterization bit-exactly (same ROI, fill, and
    DIST_MASK_PRECISE threshold) for every kernel level, including the
    unshrunk rate=1.0 text map, on polys of varied shape/orientation."""
    rng = np.random.RandomState(7)
    polys = []
    for _ in range(5):
        cx, cy = rng.uniform(20, 100), rng.uniform(20, 60)
        w, h = rng.uniform(12, 40), rng.uniform(8, 20)
        ang = rng.uniform(0, np.pi)
        c, s = np.cos(ang), np.sin(ang)
        base = np.array([[-w, -h], [w, -h], [w, h], [-w, h]], np.float32) / 2
        rot = base @ np.array([[c, -s], [s, c]], np.float32)
        polys.append(rot + [cx, cy])
    polys = np.stack(polys)
    data = {
        "image": np.zeros((80, 120, 3), np.uint8),
        "polys": polys.copy(),
        "ignore_tags": [False] * len(polys),
    }
    op = MakePseGt(kernel_num=7, size=64, min_shrink_ratio=0.4)
    out = op(data)
    got = np.concatenate([out["gt_text"][None], out["gt_kernels"]], axis=0)

    for i in range(7):
        rate = 1.0 - (1.0 - 0.4) / 6 * i
        want, _ = MakePseGt.generate_kernel(
            (80, 120), rate, polys, [False] * len(polys)
        )
        np.testing.assert_array_equal(got[i], (want > 0).astype(np.float32))
