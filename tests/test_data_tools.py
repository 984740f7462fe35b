"""Dataset prep CLIs: det/rec label generation round trip."""

import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "tools")))

from data.gen_json_label import gen_det_label, gen_rec_label
from data.gen_pubtab_label import gen_pubtab_label


def _make_img(path, size=(60, 40)):
    Image.new("RGB", size, (255, 255, 255)).save(path)


def test_gen_det_label(tmp_path):
    img_dir = tmp_path / "imgs"
    gt_dir = tmp_path / "gt"
    img_dir.mkdir()
    gt_dir.mkdir()
    _make_img(str(img_dir / "a.png"))
    (gt_dir / "a.txt").write_text("1,1,30,1,30,20,1,20,hello\n")

    out = tmp_path / "det_label.txt"
    gen_det_label(str(img_dir), str(gt_dir), str(out))
    line = out.read_text().strip()
    path, label = line.split("\t")
    assert path.endswith("a.png")
    items = json.loads(label)
    assert items[0]["transcription"] == "hello"
    assert items[0]["points"] == [[1, 1], [30, 1], [30, 20], [1, 20]]


def test_gen_rec_label(tmp_path):
    img_dir = tmp_path / "imgs"
    gt_dir = tmp_path / "gt"
    img_dir.mkdir()
    gt_dir.mkdir()
    _make_img(str(img_dir / "b.png"))
    (gt_dir / "b.txt").write_text("he llo\n")

    out = tmp_path / "rec_label.txt"
    gen_rec_label(str(img_dir), str(gt_dir), str(out))
    path, label = out.read_text().strip().split("\t")
    assert path.endswith("b.png")
    assert label == "hello"  # spaces removed (reference semantics)


def test_gen_pubtab_label(tmp_path):
    src = tmp_path / "src.jsonl"
    src.write_text(
        json.dumps({"filename": "t.png", "html": {"cells": [], "structure": {"tokens": []}}})
        + "\n"
    )
    out = tmp_path / "out.jsonl"
    gen_pubtab_label(str(tmp_path / "imgs"), str(src), str(out))
    info = json.loads(out.read_text())
    assert info["img_path"].endswith(os.path.join("imgs", "t.png"))
    assert "filename" not in info
