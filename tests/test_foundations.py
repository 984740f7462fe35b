"""Config system + geometry unit tests."""

import numpy as np
import pytest

from pytorchocr_tpu.utils import geometry
from pytorchocr_tpu.utils.config import load_config, merge_config, parse_value


def test_yaml_python_tuple(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(
        "Global:\n  seed: 1\nOptimizer:\n  optim:\n    betas: !!python/tuple [0.9, 0.999]\n"
    )
    cfg = load_config(str(p))
    assert cfg["Optimizer"]["optim"]["betas"] == (0.9, 0.999)
    assert cfg.Global.seed == 1


def test_merge_config_dotted(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("Global:\n  epoch_num: 10\n  lr: 0.1\n")
    cfg = load_config(str(p))
    merge_config(cfg, {"Global.epoch_num": 5, "Global.new_key": [1, 2]})
    assert cfg["Global"]["epoch_num"] == 5
    assert cfg["Global"]["new_key"] == [1, 2]
    assert cfg["Global"]["lr"] == 0.1


def test_parse_value_types():
    assert parse_value("3") == 3
    assert parse_value("true") is True
    assert parse_value("[1, 2]") == [1, 2]
    assert parse_value("0.5") == 0.5


def test_polygon_area_perimeter():
    sq = [[0, 0], [10, 0], [10, 10], [0, 10]]
    assert abs(abs(geometry.polygon_area(sq)) - 100) < 1e-9
    assert abs(geometry.polygon_perimeter(sq) - 40) < 1e-9


def test_shrink_distance_db_formula():
    # DB: d = A(1-r^2)/L; square 100x50: A=5000, L=300, r=0.4 -> 14.0
    poly = np.array([[0, 0], [100, 0], [100, 50], [0, 50]], dtype=np.float32)
    assert abs(geometry.shrink_distance(poly, 0.4) - 5000 * 0.84 / 300) < 1e-6


def test_iou_convex():
    a = [[0, 0], [10, 0], [10, 10], [0, 10]]
    b = [[5, 5], [15, 5], [15, 15], [5, 15]]
    assert abs(geometry.poly_iou(a, b) - 25.0 / 175.0) < 1e-9
    assert geometry.poly_iou(a, a) == 1.0


def test_unclip_rect():
    # unclip of an axis-aligned rect by d expands each side by d
    poly = np.array([[10, 10], [110, 10], [110, 60], [10, 60]], dtype=np.float32)
    pts = geometry.unclip_points(poly, 5.0)
    box, sside = geometry.min_area_rect_points(pts)
    xs, ys = box[:, 0], box[:, 1]
    assert abs(xs.min() - 5) < 0.5 and abs(xs.max() - 115) < 0.5
    assert abs(ys.min() - 5) < 0.5 and abs(ys.max() - 65) < 0.5


def test_valid_simple_polygon():
    assert geometry.is_valid_simple_polygon([[0, 0], [10, 0], [10, 10], [0, 10]])
    # bow-tie self intersection
    assert not geometry.is_valid_simple_polygon([[0, 0], [10, 10], [10, 0], [0, 10]])
    # degenerate
    assert not geometry.is_valid_simple_polygon([[0, 0], [1, 0]])


def test_rasterize_shrunk_polygon_square():
    canvas = np.zeros((80, 130), np.float32)
    poly = np.array([[10, 10], [110, 10], [110, 60], [10, 60]], dtype=np.float32)
    ok = geometry.rasterize_shrunk_polygon(canvas, poly, 14.0)
    assert ok
    ys, xs = np.where(canvas > 0)
    # expected inner box ~ [24..96] x [24..46]
    assert 20 <= xs.min() <= 26 and 94 <= xs.max() <= 100
    assert 20 <= ys.min() <= 26 and 44 <= ys.max() <= 50
