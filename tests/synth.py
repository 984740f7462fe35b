"""Synthetic dataset generation for tests: rendered text lines (rec/cls) and
text-box scenes (det) in the reference's label formats
(tab-separated `img_path \\t label`; det labels are JSON box lists)."""

import json
import os
import random

import numpy as np
from PIL import Image, ImageDraw


def make_rec_dataset(root, n=32, charset="0123456789", max_len=6, seed=0):
    rng = random.Random(seed)
    os.makedirs(root, exist_ok=True)
    lines = []
    for i in range(n):
        text = "".join(rng.choice(charset) for _ in range(rng.randint(2, max_len)))
        w = 12 * len(text) + 16
        img = Image.new("RGB", (w, 32), (255, 255, 255))
        d = ImageDraw.Draw(img)
        d.text((8, 8), text, fill=(0, 0, 0))
        path = os.path.join(root, "rec_%04d.png" % i)
        img.save(path)
        lines.append("%s\t%s" % (path, text))
    label_file = os.path.join(root, "rec_label.txt")
    with open(label_file, "w") as f:
        f.write("\n".join(lines) + "\n")
    return label_file


def make_cls_dataset(root, n=16, seed=0):
    rng = random.Random(seed)
    os.makedirs(root, exist_ok=True)
    lines = []
    for i in range(n):
        img = Image.new("RGB", (96, 24), (255, 255, 255))
        d = ImageDraw.Draw(img)
        d.text((4, 4), "text%d" % i, fill=(0, 0, 0))
        label = rng.choice(["0", "180"])
        if label == "180":
            img = img.rotate(180)
        path = os.path.join(root, "cls_%04d.png" % i)
        img.save(path)
        lines.append("%s\t%s" % (path, label))
    label_file = os.path.join(root, "cls_label.txt")
    with open(label_file, "w") as f:
        f.write("\n".join(lines) + "\n")
    return label_file


def make_det_dataset(root, n=8, size=320, seed=0):
    rng = random.Random(seed)
    os.makedirs(root, exist_ok=True)
    lines = []
    for i in range(n):
        img = Image.new("RGB", (size, size), (250, 250, 250))
        d = ImageDraw.Draw(img)
        boxes = []
        for _ in range(rng.randint(2, 4)):
            x = rng.randint(10, size - 120)
            y = rng.randint(10, size - 40)
            w = rng.randint(60, 100)
            h = rng.randint(16, 26)
            d.rectangle([x, y, x + w, y + h], fill=(0, 0, 0))
            boxes.append(
                {
                    "transcription": "text",
                    "points": [[x, y], [x + w, y], [x + w, y + h], [x, y + h]],
                }
            )
        path = os.path.join(root, "det_%04d.png" % i)
        img.save(path)
        lines.append("%s\t%s" % (path, json.dumps(boxes)))
    label_file = os.path.join(root, "det_label.txt")
    with open(label_file, "w") as f:
        f.write("\n".join(lines) + "\n")
    return label_file


def make_pubtab_dataset(root, n=8, size=96, seed=0):
    """JSON-line PubTabNet-style dataset: 2x2 tables with cell bboxes."""
    import json as _json

    rng = random.Random(seed)
    os.makedirs(root, exist_ok=True)
    lines = []
    tokens = ["<thead>", "<tr>", "<td>", "</td>", "<td>", "</td>", "</tr>",
              "</thead>", "<tbody>", "<tr>", "<td>", "</td>", "<td>", "</td>",
              "</tr>", "</tbody>"]
    for i in range(n):
        img = Image.new("RGB", (size, size), (255, 255, 255))
        d = ImageDraw.Draw(img)
        cells = []
        for r in range(2):
            for c in range(2):
                x0, y0 = 8 + c * 44, 8 + r * 44
                x1, y1 = x0 + 36, y0 + 36
                d.rectangle([x0, y0, x1, y1], outline=(0, 0, 0))
                d.text((x0 + 4, y0 + 4), str(rng.randint(0, 99)), fill=(0, 0, 0))
                cells.append({
                    "tokens": ["x"],
                    "bbox": [x0, y0, x1, y0, x1, y1, x0, y1],
                })
        path = os.path.join(root, "tab_%04d.png" % i)
        img.save(path)
        lines.append(_json.dumps({
            "img_path": path,
            "html": {"cells": cells, "structure": {"tokens": tokens}},
        }, ensure_ascii=False))
    label_file = os.path.join(root, "tab_label.jsonl")
    with open(label_file, "w") as f:
        f.write("\n".join(lines) + "\n")
    return label_file
