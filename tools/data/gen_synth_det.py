"""Deterministic synthetic text-DETECTION benchmark generator.

No public OCR dataset ships in this environment, so this renders a
non-trivial stand-in for an ICDAR-style det benchmark (QUALITY.md): pages
with real font-rendered text lines at varied sizes, gray levels and slight
rotations, on textured backgrounds with non-text distractors — hard enough
that an untrained model scores ~0 and a converged DB model must genuinely
localize glyph clusters, not just threshold dark pixels.

Output format matches the framework's det pipeline (and the reference's
gen_json_label.py output): one JSON-line per image,
  <img_path>\t[{"transcription": ..., "points": [[x,y]x4]}, ...]
with held-out eval split. Fully seeded -> byte-reproducible.

Usage:
  python tools/data/gen_synth_det.py --out /tmp/synthdet \
      --train 400 --eval 100 [--size 640] [--seed 2022]
"""

import argparse
import json
import math
import os
import random
import string

import numpy as np
from PIL import Image, ImageDraw, ImageFilter, ImageFont

FONT_CANDIDATES = [
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
]

# fonts NEVER used by the base style — the shifted style renders with these
# so a shift eval measures robustness to unseen glyph shapes, not memorized
# rasterizations
SHIFT_FONT_CANDIDATES = [
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Bold.ttf",
]

# Style parameters. "base" is the training distribution (QUALITY.md);
# "shifted" is a deliberately different rendering regime for
# distribution-shift evaluation: unseen fonts, mid-gray (lower-contrast)
# backgrounds with stronger illumination/noise, a wider glyph-size and
# rotation range, denser/sparser pages and more clutter.  Same task, same
# label format — only the rendering distribution moves.
STYLES = {
    "base": dict(
        bg_lo=215, bg_hi=245, grad=18.0, noise=4.0,
        ink_lo=10, ink_hi=90, px_lo=14, px_hi=34, angle=8.0,
        min_lines=6, max_lines=14, distract_lo=1, distract_hi=4,
        blur_p=0.3, blur_r=0.6,
    ),
    "shifted": dict(
        bg_lo=150, bg_hi=195, grad=30.0, noise=8.0,
        ink_lo=5, ink_hi=70, px_lo=12, px_hi=40, angle=15.0,
        min_lines=4, max_lines=18, distract_lo=2, distract_hi=6,
        blur_p=0.5, blur_r=1.0,
    ),
}


def _fonts(style="base"):
    cands = SHIFT_FONT_CANDIDATES if style == "shifted" else FONT_CANDIDATES
    found = [p for p in cands if os.path.exists(p)]
    if not found:
        raise RuntimeError(
            "no TTF fonts found in %s; install fonts or edit the candidate "
            "list" % cands
        )
    return found


def _rand_word(rng, lo=3, hi=12):
    n = rng.randint(lo, hi)
    chars = string.ascii_letters + string.digits
    return "".join(rng.choice(chars) for _ in range(n))


def _textured_background(rng, size, style):
    """Paper-like background: base tint + low-frequency blotches + noise."""
    base = rng.randint(style["bg_lo"], style["bg_hi"])
    arr = np.full((size, size, 3), base, np.uint8)
    nprng = np.random.RandomState(rng.randint(0, 1 << 31))
    # low-frequency illumination gradient
    gx = nprng.uniform(-style["grad"], style["grad"])
    gy = nprng.uniform(-style["grad"], style["grad"])
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    grad = (gx * xx + gy * yy)[:, :, None]
    noise = nprng.normal(0, style["noise"], (size, size, 1))
    arr = np.clip(arr.astype(np.float32) + grad + noise, 0, 255).astype(np.uint8)
    return Image.fromarray(arr)


def _draw_distractors(img, draw, rng, style):
    """Non-text clutter the detector must NOT fire on: rules, frames, blobs."""
    size = img.size[0]
    for _ in range(rng.randint(style["distract_lo"], style["distract_hi"])):
        kind = rng.choice(["hline", "vline", "frame", "blob"])
        g = rng.randint(120, 190)
        if kind == "hline":
            y = rng.randint(0, size - 1)
            draw.line([(rng.randint(0, size // 3), y),
                       (size - rng.randint(0, size // 3), y)],
                      fill=(g, g, g), width=rng.randint(1, 3))
        elif kind == "vline":
            x = rng.randint(0, size - 1)
            draw.line([(x, rng.randint(0, size // 3)),
                       (x, size - rng.randint(0, size // 3))],
                      fill=(g, g, g), width=rng.randint(1, 3))
        elif kind == "frame":
            x0, y0 = rng.randint(0, size - 80), rng.randint(0, size - 80)
            x1, y1 = x0 + rng.randint(50, 79), y0 + rng.randint(50, 79)
            draw.rectangle([x0, y0, x1, y1], outline=(g, g, g),
                           width=rng.randint(1, 2))
        else:
            x, y = rng.randint(0, size - 30), rng.randint(0, size - 30)
            r = rng.randint(6, 18)
            draw.ellipse([x, y, x + r, y + r], fill=(g, g, g))


def _render_line(rng, fonts, style):
    """One rotated text-line tile + its tight quad (local coords)."""
    text = " ".join(_rand_word(rng) for _ in range(rng.randint(1, 3)))
    px = rng.randint(style["px_lo"], style["px_hi"])
    font = ImageFont.truetype(rng.choice(fonts), px)
    # measure
    tmp = Image.new("L", (1, 1))
    bbox = ImageDraw.Draw(tmp).textbbox((0, 0), text, font=font)
    tw, th = bbox[2] - bbox[0], bbox[3] - bbox[1]
    if tw < 8 or th < 6:
        return None
    pad = 4
    tile = Image.new("RGBA", (tw + 2 * pad, th + 2 * pad), (0, 0, 0, 0))
    ink = rng.randint(style["ink_lo"], style["ink_hi"])
    ImageDraw.Draw(tile).text(
        (pad - bbox[0], pad - bbox[1]), text, font=font, fill=(ink, ink, ink, 255)
    )
    angle = rng.uniform(-style["angle"], style["angle"])
    tile = tile.rotate(angle, expand=True, resample=Image.BICUBIC)
    # tight quad = rotated rectangle corners of the unpadded text box
    cx, cy = tile.size[0] / 2, tile.size[1] / 2
    a = math.radians(-angle)
    cosa, sina = math.cos(a), math.sin(a)
    hw, hh = tw / 2, th / 2
    quad = []
    for dx, dy in [(-hw, -hh), (hw, -hh), (hw, hh), (-hw, hh)]:
        quad.append((cx + dx * cosa - dy * sina, cy + dx * sina + dy * cosa))
    return text, tile, quad


def render_page(rng, size, fonts, style=None):
    style = style or STYLES["base"]
    img = _textured_background(rng, size, style)
    draw = ImageDraw.Draw(img)
    _draw_distractors(img, draw, rng, style)

    boxes = []
    occupied = np.zeros((size, size), bool)
    attempts = 0
    want = rng.randint(style["min_lines"], style["max_lines"])
    while len(boxes) < want and attempts < want * 12:
        attempts += 1
        r = _render_line(rng, fonts, style)
        if r is None:
            continue
        text, tile, quad = r
        tw, th = tile.size
        if tw >= size - 2 or th >= size - 2:
            continue
        x = rng.randint(1, size - tw - 1)
        y = rng.randint(1, size - th - 1)
        # overlap check against already-placed lines (dilated)
        x0, y0 = max(x - 4, 0), max(y - 4, 0)
        x1, y1 = min(x + tw + 4, size), min(y + th + 4, size)
        if occupied[y0:y1, x0:x1].any():
            continue
        occupied[y0:y1, x0:x1] = True
        img.paste(tile, (x, y), tile)
        pts = [[int(round(px_ + x)), int(round(py_ + y))] for px_, py_ in quad]
        boxes.append({"transcription": text, "points": pts})
    # mild global blur ~ scanner softness
    if rng.random() < style["blur_p"]:
        img = img.filter(ImageFilter.GaussianBlur(style["blur_r"]))
    return img.convert("RGB"), boxes


def generate(out_dir, n, size, rng, fonts, split, style=None):
    img_dir = os.path.join(out_dir, split)
    os.makedirs(img_dir, exist_ok=True)
    lines = []
    for i in range(n):
        img, boxes = render_page(rng, size, fonts, style)
        path = os.path.abspath(os.path.join(img_dir, "%s_%05d.png" % (split, i)))
        img.save(path)
        lines.append("%s\t%s" % (path, json.dumps(boxes)))
        if (i + 1) % 50 == 0:
            print("  %s: %d/%d" % (split, i + 1, n), flush=True)
    label_path = os.path.join(out_dir, "%s_label.txt" % split)
    with open(label_path, "w", encoding="UTF-8") as f:
        f.write("\n".join(lines) + "\n")
    return label_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train", type=int, default=400)
    ap.add_argument("--eval", type=int, default=100)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--seed", type=int, default=2022)
    ap.add_argument(
        "--style", choices=sorted(STYLES), default="base",
        help="rendering distribution: base (training benchmark) or shifted "
        "(unseen fonts, lower-contrast mid-gray pages, wider glyph-size/"
        "rotation range) for distribution-shift evaluation",
    )
    args = ap.parse_args()

    style = STYLES[args.style]
    fonts = _fonts(args.style)
    rng = random.Random(args.seed)
    os.makedirs(args.out, exist_ok=True)
    train_label = generate(args.out, args.train, args.size, rng, fonts, "train", style)
    eval_label = generate(args.out, args.eval, args.size, rng, fonts, "eval", style)
    print(json.dumps({"train_label": train_label, "eval_label": eval_label}))


if __name__ == "__main__":
    main()
