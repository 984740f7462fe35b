"""Deterministic synthetic TABLE-recognition benchmark generator.

No PubTabNet ships in this environment, so this renders a non-trivial
stand-in for a table-structure benchmark (QUALITY.md): tables with varied
row/column counts, occasional header colspans, empty cells, several ruling
styles (full grid / horizontal rules / header rule only), header shading,
gray-level and size jitter and sensor noise — hard enough that the SLA
structure decoder must genuinely read the layout (an untrained model
scores ~0 structure accuracy).

Output format matches the framework's PubTabDataSet (and the reference's
PubTabNet jsonl, reference pytocr/data/pubtab_dataset.py): one JSON line
per image:
  {"img_path": ..., "html": {"cells": [{"tokens": [chars...],
      "bbox": [x1,y1,x2,y2,x3,y3,x4,y4]}, ...],
      "structure": {"tokens": ["<thead>", "<tr>", "<td>", ...]}}}
Non-empty cells carry an 8-coordinate (xyxyxyxy) text bbox, matching
`TableLabelEncode(loc_reg_num=8)` + `TableBoxEncode(xyxyxyxy)`
(configs/table/*.yml). Empty cells have tokens [] and no bbox, exactly
like PubTabNet. Fully seeded -> byte-reproducible.

Usage:
  python tools/data/gen_synth_table.py --out ./train_data/synthtable \
      --train 400 --eval 100 [--seed 2022]
"""

import argparse
import json
import os
import random
import string

import numpy as np
from PIL import Image, ImageDraw, ImageFont

FONT_CANDIDATES = [
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
]


def _fonts():
    found = [p for p in FONT_CANDIDATES if os.path.exists(p)]
    if not found:
        raise RuntimeError(
            "no TTF fonts found in %s; install fonts or edit FONT_CANDIDATES"
            % FONT_CANDIDATES
        )
    return found


def _cell_text(rng):
    """Short word / number / word-pair, PubTabNet-cell-like."""
    kind = rng.random()
    if kind < 0.4:  # number, maybe decimal / percent
        s = str(rng.randint(0, 9999))
        if rng.random() < 0.4:
            s += "." + str(rng.randint(0, 99))
        if rng.random() < 0.2:
            s += "%"
        return s
    n = rng.randint(3, 9)
    w = "".join(rng.choice(string.ascii_lowercase) for _ in range(n))
    if kind < 0.55:
        w = w.capitalize()
    if kind > 0.85:
        w += " " + "".join(
            rng.choice(string.ascii_lowercase) for _ in range(rng.randint(2, 6))
        )
    return w


def _col_widths(rng, n_cols, total):
    raw = [rng.uniform(0.6, 1.6) for _ in range(n_cols)]
    s = sum(raw)
    widths = [max(30, int(total * r / s)) for r in raw]
    widths[-1] = total - sum(widths[:-1])
    return widths


def render_table(rng, fonts):
    """One table image + PubTabNet-style cells/structure tokens."""
    n_cols = rng.randint(2, 6)
    n_body = rng.randint(3, 7)
    font_px = rng.randint(13, 20)
    font = ImageFont.truetype(rng.choice(fonts), font_px)
    row_h = font_px + rng.randint(10, 18)
    margin = rng.randint(8, 24)
    lo_w = max(70 * n_cols, 300)
    table_w = rng.randint(lo_w, max(lo_w + 40, 460))
    col_w = _col_widths(rng, n_cols, table_w)
    img_w = table_w + 2 * margin
    img_h = (n_body + 1) * row_h + 2 * margin

    base = rng.randint(235, 255)
    arr = np.full((img_h, img_w, 3), base, np.uint8)
    nprng = np.random.RandomState(rng.randint(0, 1 << 31))
    arr = np.clip(
        arr.astype(np.float32) + nprng.normal(0, 3, (img_h, img_w, 1)), 0, 255
    ).astype(np.uint8)
    img = Image.fromarray(arr)
    draw = ImageDraw.Draw(img)

    x_edges = [margin]
    for w in col_w:
        x_edges.append(x_edges[-1] + w)
    y_edges = [margin + r * row_h for r in range(n_body + 2)]

    # header shading
    if rng.random() < 0.5:
        g = rng.randint(200, 228)
        draw.rectangle(
            [x_edges[0], y_edges[0], x_edges[-1], y_edges[1]], fill=(g, g, g)
        )

    # ruling style
    style = rng.choice(["grid", "hlines", "headrule"])
    lg = rng.randint(60, 140)
    line = (lg, lg, lg)
    if style == "grid":
        for x in x_edges:
            draw.line([(x, y_edges[0]), (x, y_edges[-1])], fill=line, width=1)
        for y in y_edges:
            draw.line([(x_edges[0], y), (x_edges[-1], y)], fill=line, width=1)
    elif style == "hlines":
        for y in y_edges:
            draw.line([(x_edges[0], y), (x_edges[-1], y)], fill=line, width=1)
    else:  # headrule: top, below-header, bottom (booktabs-like)
        for y in (y_edges[0], y_edges[1], y_edges[-1]):
            draw.line([(x_edges[0], y), (x_edges[-1], y)], fill=line, width=2)

    # header colspan: merge a random run of 2-3 columns (30% of tables)
    span_start, span_len = -1, 0
    if n_cols >= 3 and rng.random() < 0.3:
        span_len = rng.randint(2, min(3, n_cols - 1))
        span_start = rng.randint(0, n_cols - span_len)

    cells = []
    structure = ["<thead>", "<tr>"]

    def _emit_cell(x0, x1, y0, y1, colspan=1, force_text=None):
        """Draw one cell's text; append cell record + structure tokens."""
        empty = force_text is None and rng.random() < 0.06
        if colspan > 1:
            structure.extend(["<td", ' colspan="%d"' % colspan, ">", "</td>"])
        else:
            structure.extend(["<td>", "</td>"])
        if empty:
            cells.append({"tokens": []})
            return
        text = force_text if force_text is not None else _cell_text(rng)
        bb = draw.textbbox((0, 0), text, font=font)
        tw, th = bb[2] - bb[0], bb[3] - bb[1]
        avail = (x1 - x0) - 8
        while tw > avail and len(text) > 1:  # shrink to fit
            text = text[:-1]
            bb = draw.textbbox((0, 0), text, font=font)
            tw, th = bb[2] - bb[0], bb[3] - bb[1]
        align = rng.choice(["l", "c"]) if colspan == 1 else "c"
        tx = x0 + 4 if align == "l" else x0 + ((x1 - x0) - tw) // 2
        ty = y0 + ((y1 - y0) - th) // 2
        ink = rng.randint(0, 70)
        draw.text((tx - bb[0], ty - bb[1]), text, font=font, fill=(ink, ink, ink))
        x0t, y0t, x1t, y1t = tx, ty, tx + tw, ty + th
        cells.append(
            {
                "tokens": list(text),
                "bbox": [x0t, y0t, x1t, y0t, x1t, y1t, x0t, y1t],
            }
        )

    # header row
    c = 0
    while c < n_cols:
        if c == span_start:
            _emit_cell(
                x_edges[c], x_edges[c + span_len], y_edges[0], y_edges[1],
                colspan=span_len,
                force_text=_cell_text(rng),
            )
            c += span_len
        else:
            _emit_cell(x_edges[c], x_edges[c + 1], y_edges[0], y_edges[1])
            c += 1
    structure.extend(["</tr>", "</thead>", "<tbody>"])

    # body rows
    for r in range(n_body):
        structure.append("<tr>")
        for c in range(n_cols):
            _emit_cell(
                x_edges[c], x_edges[c + 1], y_edges[r + 1], y_edges[r + 2]
            )
        structure.append("</tr>")
    structure.append("</tbody>")

    return img, cells, structure


def generate(out_dir, n, rng, fonts, split):
    img_dir = os.path.join(out_dir, split)
    os.makedirs(img_dir, exist_ok=True)
    lines = []
    for i in range(n):
        img, cells, structure = render_table(rng, fonts)
        path = os.path.abspath(os.path.join(img_dir, "%s_%05d.png" % (split, i)))
        img.save(path)
        rec = {
            "img_path": path,
            "html": {"cells": cells, "structure": {"tokens": structure}},
        }
        lines.append(json.dumps(rec, ensure_ascii=False))
        if (i + 1) % 50 == 0:
            print("  %s: %d/%d" % (split, i + 1, n), flush=True)
    label_path = os.path.join(out_dir, "%s_label.jsonl" % split)
    with open(label_path, "w", encoding="UTF-8") as f:
        f.write("\n".join(lines) + "\n")
    return label_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train", type=int, default=400)
    ap.add_argument("--eval", type=int, default=100)
    ap.add_argument("--seed", type=int, default=2022)
    args = ap.parse_args()

    fonts = _fonts()
    rng = random.Random(args.seed)
    os.makedirs(args.out, exist_ok=True)
    train_label = generate(args.out, args.train, rng, fonts, "train")
    eval_label = generate(args.out, args.eval, rng, fonts, "eval")
    print(json.dumps({"train_label": train_label, "eval_label": eval_label}))


if __name__ == "__main__":
    main()
