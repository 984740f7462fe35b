"""Native C++ geometry kernels: build + parity with cv2/numpy paths."""

import numpy as np
import pytest

import cv2

from pytorchocr_tpu import native
from pytorchocr_tpu.utils import geometry


pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain unavailable"
)


def _area(b):
    x, y = b[:, 0], b[:, 1]
    return abs(0.5 * np.sum(x * np.roll(y, 1) - y * np.roll(x, 1)))


def test_min_area_rect_matches_cv2():
    rng = np.random.RandomState(42)
    for _ in range(20):
        pts = rng.rand(rng.randint(3, 40), 2).astype(np.float32) * 200
        box, ss = native.min_area_rect(pts)
        rect = cv2.minAreaRect(pts.reshape(-1, 1, 2))
        assert abs(_area(box) - _area(cv2.boxPoints(rect))) < 0.5
        assert abs(ss - min(rect[1])) < 0.5


def test_intersection_area_matches_numpy():
    rng = np.random.RandomState(0)
    for _ in range(20):
        a = rng.rand(4, 2) * 50
        b = rng.rand(4, 2) * 50 + 10
        # make them convex quads via hull of random points
        a = cv2.convexHull(a.astype(np.float32)).reshape(-1, 2)
        b = cv2.convexHull(b.astype(np.float32)).reshape(-1, 2)
        if len(a) < 3 or len(b) < 3:
            continue
        got = native.poly_intersection_area(a, b)
        want = geometry.poly_intersection_area(a, b)
        assert abs(got - want) < 1e-2


def test_make_border_map_native_matches_numpy():
    """Native whole-sample MakeBorderMap == the numpy per-polygon path,
    including ragged polygon lists and ignore tags."""
    from pytorchocr_tpu.data.imaug.make_border_map import MakeBorderMap

    rng = np.random.RandomState(7)
    op = MakeBorderMap(shrink_ratio=0.4)
    for trial in range(5):
        h, w = 160, 224
        polys = []
        for _ in range(rng.randint(1, 5)):
            cx, cy = rng.rand(2) * [w, h]
            n = rng.choice([4, 6])  # ragged mix of quads and hexagons
            ang = np.sort(rng.rand(n)) * 2 * np.pi
            r = 10 + rng.rand(n) * 30
            polys.append(
                np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], 1).astype(
                    np.float32
                )
            )
        ignore = [bool(rng.rand() < 0.3) for _ in polys]
        img = np.zeros((h, w, 3), np.uint8)

        got = op({"image": img, "polys": polys, "ignore_tags": ignore})
        want_canvas = np.zeros((h, w), np.float32)
        want_mask = np.zeros((h, w), np.float32)
        for p, ig in zip(polys, ignore):
            if not ig:
                op.draw_border_map(p, want_canvas, mask=want_mask)
        want_canvas = want_canvas * (op.thresh_max - op.thresh_min) + op.thresh_min

        np.testing.assert_array_equal(got["threshold_mask"], want_mask)
        np.testing.assert_allclose(
            got["threshold_map"], want_canvas, rtol=0, atol=2e-5
        )


def test_iou_matrix_in_evaluator():
    from pytorchocr_tpu.metrics.eval_det_iou import DetectionIoUEvaluator

    ev = DetectionIoUEvaluator()
    gt = [
        {"points": [[0, 0], [10, 0], [10, 10], [0, 10]], "text": "", "ignore": False},
        {"points": [[20, 20], [30, 20], [30, 30], [20, 30]], "text": "", "ignore": False},
    ]
    pred = [{"points": [[1, 1], [10, 0], [10, 10], [0, 10]], "text": ""}]
    res = ev.evaluate_image(gt, pred)
    assert res == {"gtCare": 2, "detCare": 1, "detMatched": 1}
    combined = ev.combine_results([res])
    assert abs(combined["recall"] - 0.5) < 1e-9
    assert abs(combined["precision"] - 1.0) < 1e-9
