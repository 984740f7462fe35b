"""Deterministic synthetic text-RECOGNITION benchmark generator.

Companion to gen_synth_det.py for QUALITY.md: font-rendered alphanumeric
text lines (all covered by the default 6,623-char dict) with varied fonts,
sizes, ink levels, jitter, rotation and noise — non-trivial for CRNN but
learnable to high accuracy, giving an exact-match/edit-distance quality
number the reference's README leaves TODO (reference README.md:66-69).

Output: `<img_path>\t<text>` label files with held-out eval split.

Usage:
  python tools/data/gen_synth_rec.py --out /tmp/synthrec \
      --train 2000 --eval 500 [--seed 2022]
"""

import argparse
import json
import os
import random
import string

import numpy as np
from PIL import Image, ImageDraw, ImageFilter, ImageFont

from gen_synth_det import FONT_CANDIDATES, _fonts  # noqa: F401 (same font set)


def _rand_text(rng, lo=2, hi=10):
    chars = string.ascii_letters + string.digits
    return "".join(rng.choice(chars) for _ in range(rng.randint(lo, hi)))


# rendering distributions (same scheme as gen_synth_det.py): "shifted" is
# the held-out distribution-shift eval — fonts the base training
# distribution never uses, lower-contrast mid-gray backgrounds, wider
# size/rotation range, heavier blur/noise
STYLES = {
    "base": dict(px=(18, 26), bg=(215, 250), ink=(0, 80), rot=3.0,
                 rot_p=0.4, blur_p=0.3, blur=(0.3, 0.8), noise=(2, 7)),
    "shifted": dict(px=(14, 32), bg=(150, 200), ink=(30, 110), rot=8.0,
                    rot_p=0.7, blur_p=0.5, blur=(0.4, 1.2), noise=(4, 10)),
}


def render_line(rng, fonts, style="base"):
    st = STYLES[style]
    text = _rand_text(rng)
    px = rng.randint(*st["px"])
    font = ImageFont.truetype(rng.choice(fonts), px)
    tmp = Image.new("L", (1, 1))
    bbox = ImageDraw.Draw(tmp).textbbox((0, 0), text, font=font)
    tw, th = bbox[2] - bbox[0], bbox[3] - bbox[1]
    pad_x, pad_y = rng.randint(3, 10), rng.randint(2, 6)
    bg = rng.randint(*st["bg"])
    img = Image.new("L", (tw + 2 * pad_x, th + 2 * pad_y), bg)
    ink = rng.randint(*st["ink"])
    ImageDraw.Draw(img).text((pad_x - bbox[0], pad_y - bbox[1]), text,
                             font=font, fill=ink)
    if rng.random() < st["rot_p"]:
        img = img.rotate(rng.uniform(-st["rot"], st["rot"]), expand=False,
                         fillcolor=bg, resample=Image.BICUBIC)
    if rng.random() < st["blur_p"]:
        img = img.filter(ImageFilter.GaussianBlur(rng.uniform(*st["blur"])))
    arr = np.asarray(img, np.float32)
    nprng = np.random.RandomState(rng.randint(0, 1 << 31))
    arr = np.clip(arr + nprng.normal(0, rng.uniform(*st["noise"]), arr.shape),
                  0, 255)
    return Image.fromarray(arr.astype(np.uint8)).convert("RGB"), text


def generate(out_dir, n, rng, fonts, split, style="base"):
    img_dir = os.path.join(out_dir, split)
    os.makedirs(img_dir, exist_ok=True)
    lines = []
    for i in range(n):
        img, text = render_line(rng, fonts, style)
        path = os.path.abspath(os.path.join(img_dir, "%s_%05d.png" % (split, i)))
        img.save(path)
        lines.append("%s\t%s" % (path, text))
        if (i + 1) % 250 == 0:
            print("  %s: %d/%d" % (split, i + 1, n), flush=True)
    label_path = os.path.join(out_dir, "%s_label.txt" % split)
    with open(label_path, "w", encoding="UTF-8") as f:
        f.write("\n".join(lines) + "\n")
    return label_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train", type=int, default=2000)
    ap.add_argument("--eval", type=int, default=500)
    ap.add_argument("--seed", type=int, default=2022)
    ap.add_argument("--style", choices=["base", "shifted"], default="base",
                    help="rendering distribution: base (training benchmark) "
                    "or shifted (unseen fonts, low-contrast mid-gray "
                    "backgrounds, wider size/rotation) for "
                    "distribution-shift evaluation")
    args = ap.parse_args()

    fonts = _fonts(args.style)
    rng = random.Random(args.seed)
    os.makedirs(args.out, exist_ok=True)
    train_label = generate(args.out, args.train, rng, fonts, "train", args.style)
    eval_label = generate(args.out, args.eval, rng, fonts, "eval", args.style)
    print(json.dumps({"train_label": train_label, "eval_label": eval_label}))


if __name__ == "__main__":
    main()
