"""Deterministic synthetic text-direction CLASSIFICATION benchmark.

Companion to gen_synth_rec.py for QUALITY.md: the same font-rendered text
lines, half of them rotated 180° (label "180", else "0") — the exact task
of the cls leg in the OCR pipeline (reference deploy/pytorch/run_ocr.py
flips lines the classifier calls "180" before recognition).

Output: `<img_path>\t<0|180>` label files with held-out eval split.

Usage:
  python tools/data/gen_synth_cls.py --out /tmp/synthcls \
      --train 2000 --eval 500 [--seed 2022]
"""

import argparse
import json
import os
import random

from gen_synth_det import _fonts  # noqa: F401 (same font set)
from gen_synth_rec import render_line


def generate(out_dir, n, rng, fonts, split):
    img_dir = os.path.join(out_dir, split)
    os.makedirs(img_dir, exist_ok=True)
    lines = []
    for i in range(n):
        img, _ = render_line(rng, fonts)
        label = rng.choice(["0", "180"])
        if label == "180":
            img = img.rotate(180)
        path = os.path.abspath(os.path.join(img_dir, "%s_%05d.png" % (split, i)))
        img.save(path)
        lines.append("%s\t%s" % (path, label))
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
    args = ap.parse_args()

    fonts = _fonts()
    rng = random.Random(args.seed)
    os.makedirs(args.out, exist_ok=True)
    train_label = generate(args.out, args.train, rng, fonts, "train")
    eval_label = generate(args.out, args.eval, rng, fonts, "eval")
    print(json.dumps({"train_label": train_label, "eval_label": eval_label}))


if __name__ == "__main__":
    main()
