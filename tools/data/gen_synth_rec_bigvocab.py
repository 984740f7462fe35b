"""Large-vocabulary (Chinese-protocol-shaped) recognition benchmark.

The reference's PRIMARY recognition protocol is the 6,622-entry dict
(reference pytocr/utils/char_dict_6623.txt, default in
configs/rec/rec_vgg_bilstm_ctc.yml) — a 6,623-way CTC softmax.  This host
has NO CJK-capable font (only the DejaVu family ships; Chinese glyphs
would render as tofu — visually identical classes are unlearnable), so
this generator builds the closest honest equivalent of that protocol:

  * ACTIVE charset: N codepoints drawn from the intersection of the
    DejaVu fonts' cmaps (Latin/Greek/Cyrillic/symbols...), DEDUPED BY
    RENDERED BITMAP so no two classes are homoglyphs (Greek Alpha vs
    Latin A etc. — pixel-identical in DejaVu, hence dropped);
  * DICT: exactly 6,622 entries — the active set first, then padding
    chars taken from the reference 6,623-char dict (never rendered, but
    they keep the softmax width, the dict plumbing and the decode path
    bit-identical to the Chinese protocol's).

What this proves (QUALITY.md): a 6,623-way CTC softmax escaping the
all-blank plateau and reaching useful exact-match — the property round-2
QUALITY.md claimed CTC could not deliver, without evidence.

Train-time augmentation is meant to stay OFF for this benchmark (the
variability — font, size, ink, rotation, blur, noise — is baked into the
rendered images): the host has one CPU core and the aug chain would
dominate wall time (see configs/rec/rec_vgg_bilstm_ctc_bigvocab.yml).

Usage:
  python tools/data/gen_synth_rec_bigvocab.py --out ./train_data/synthrec_big \
      --train 4000 --eval 600 [--active 1500] [--seed 2022]
"""

import argparse
import json
import os
import random
import sys
import unicodedata

import numpy as np
from PIL import Image, ImageDraw, ImageFilter, ImageFont

sys.path.append(os.path.dirname(os.path.abspath(__file__)))
from gen_synth_det import _fonts  # noqa: E402

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
REF_DICT = os.path.join(REPO, "pytorchocr_tpu", "utils", "char_dict_6623.txt")
DICT_SIZE = 6622  # reference protocol: 6,622 chars + CTC blank = 6,623-way


def _renderable_codepoints(font_paths):
    """Codepoints present in EVERY font's cmap, filtered to printable
    letter/number/punct/symbol categories."""
    from fontTools.ttLib import TTFont

    sets = []
    for p in font_paths:
        try:
            cmap = TTFont(p, fontNumber=0).getBestCmap()
        except Exception:
            continue
        sets.append(set(cmap))
    cps = set.intersection(*sets) if sets else set()
    out = []
    for cp in sorted(cps):
        if cp < 0x21 or cp > 0x2FFFF:
            continue
        ch = chr(cp)
        if unicodedata.category(ch)[0] not in "LNPS":
            continue
        out.append(ch)
    return out


def _dedupe_by_glyph(chars, font_path, px=24):
    """Keep one char per unique rendered bitmap (kills homoglyphs and
    tofu/blank glyphs).  First occurrence wins => ASCII (lowest
    codepoints) survives its homoglyph classes."""
    font = ImageFont.truetype(font_path, px)
    seen = {}
    kept = []
    for ch in chars:
        key = _glyph_key(ch, font, px)
        if key is None or key in seen:
            continue
        seen[key] = ch
        kept.append(ch)
    return kept


def _glyph_key(ch, font, px=24):
    """Tight-cropped rendered bitmap of ``ch`` as a hashable key, or None
    if nothing renders."""
    img = Image.new("L", (px * 3, px * 2), 0)
    try:
        ImageDraw.Draw(img).text((px // 2, px // 4), ch, font=font, fill=255)
    except Exception:
        return None
    arr = np.asarray(img)
    if arr.max() == 0:  # nothing rendered
        return None
    ys, xs = np.nonzero(arr > 32)
    crop = arr[ys.min():ys.max() + 1, xs.min():xs.max() + 1]
    return (crop.shape, crop.tobytes())


def _dedupe_by_glyph_all_fonts(chars, font_paths, px=24):
    """Keep a char only if its rendered bitmap is distinct from every
    previously-kept char's bitmap in EVERY render font.  render_line draws
    with a random font from the whole family, so two classes distinct in
    fonts[0] but pixel-identical in another face (e.g. '3'/'З' in the
    mono face) would inject irreducible label noise; deduping on the
    union of bitmaps removes them (measured on this host: 15/1500 active
    chars were ambiguous in at least one DejaVu face).  First occurrence
    wins, as in the single-font variant."""
    fonts = [ImageFont.truetype(p, px) for p in font_paths]
    seen = [set() for _ in fonts]
    kept = []
    for ch in chars:
        keys = []
        for font, s in zip(fonts, seen):
            key = _glyph_key(ch, font, px)
            if key is None or key in s:
                keys = None
                break
            keys.append(key)
        if keys is None:
            continue
        for s, key in zip(seen, keys):
            s.add(key)
        kept.append(ch)
    return kept


def build_charset(fonts, active_n, rng, dedupe_fonts="all"):
    chars = _renderable_codepoints(fonts)
    if dedupe_fonts == "all":
        chars = _dedupe_by_glyph_all_fonts(chars, fonts)
    else:  # "first": the pre-r4 behavior, kept so the retired v1
        # benchmark's dict (git history only; the packaged
        # char_dict_bigvocab.txt is the 'all' output) stays reproducible
        chars = _dedupe_by_glyph(chars, fonts[0])
    ascii_core = [c for c in chars if ord(c) < 0x7F]
    rest = [c for c in chars if ord(c) >= 0x7F]
    rng.shuffle(rest)
    active = ascii_core + rest[: max(active_n - len(ascii_core), 0)]
    active = sorted(set(active))

    # pad to the reference's exact dict size with (unrenderable) chars
    # from the reference 6,623-char dict — softmax width parity
    with open(REF_DICT, encoding="UTF-8") as f:
        ref_chars = [l.rstrip("\n") for l in f if l.rstrip("\n")]
    pad = [c for c in ref_chars if c not in set(active)]
    dict_chars = active + pad[: DICT_SIZE - len(active)]
    assert len(dict_chars) == DICT_SIZE, len(dict_chars)
    return active, dict_chars


def render_line(rng, fonts, active):
    text = "".join(rng.choice(active) for _ in range(rng.randint(2, 8)))
    px = rng.randint(18, 26)
    font = ImageFont.truetype(rng.choice(fonts), px)
    tmp = Image.new("L", (1, 1))
    bbox = ImageDraw.Draw(tmp).textbbox((0, 0), text, font=font)
    tw, th = bbox[2] - bbox[0], bbox[3] - bbox[1]
    if tw <= 0 or th <= 0:
        return None
    pad_x, pad_y = rng.randint(3, 10), rng.randint(2, 6)
    bg = rng.randint(215, 250)
    img = Image.new("L", (tw + 2 * pad_x, th + 2 * pad_y), bg)
    ink = rng.randint(0, 80)
    ImageDraw.Draw(img).text((pad_x - bbox[0], pad_y - bbox[1]), text,
                             font=font, fill=ink)
    if rng.random() < 0.4:
        img = img.rotate(rng.uniform(-3, 3), expand=False, fillcolor=bg,
                         resample=Image.BICUBIC)
    if rng.random() < 0.3:
        img = img.filter(ImageFilter.GaussianBlur(rng.uniform(0.3, 0.8)))
    arr = np.asarray(img, np.float32)
    nprng = np.random.RandomState(rng.randint(0, 1 << 31))
    arr = np.clip(arr + nprng.normal(0, rng.uniform(2, 7), arr.shape), 0, 255)
    return Image.fromarray(arr.astype(np.uint8)).convert("RGB"), text


def generate(out_dir, n, rng, fonts, active, split):
    img_dir = os.path.join(out_dir, split)
    os.makedirs(img_dir, exist_ok=True)
    lines = []
    i = 0
    while i < n:
        r = render_line(rng, fonts, active)
        if r is None:
            continue
        img, text = r
        path = os.path.abspath(os.path.join(img_dir, "%s_%05d.png" % (split, i)))
        img.save(path)
        lines.append("%s\t%s" % (path, text))
        i += 1
        if i % 500 == 0:
            print("  %s: %d/%d" % (split, i, n), flush=True)
    label_path = os.path.join(out_dir, "%s_label.txt" % split)
    with open(label_path, "w", encoding="UTF-8") as f:
        f.write("\n".join(lines) + "\n")
    return label_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train", type=int, default=4000)
    ap.add_argument("--eval", type=int, default=600)
    ap.add_argument("--active", type=int, default=1500,
                    help="number of distinct renderable classes used in text")
    ap.add_argument("--seed", type=int, default=2022)
    ap.add_argument("--dedupe_fonts", choices=["all", "first"], default="all",
                    help="homoglyph dedupe scope: 'all' (default) requires "
                    "glyphs distinct in every render font and produces the "
                    "packaged (v2) char_dict_bigvocab.txt; 'first' is the "
                    "pre-r4 behavior that produced the retired v1 dict "
                    "(preserved only in git history)")
    args = ap.parse_args()

    fonts = _fonts()
    rng = random.Random(args.seed)
    os.makedirs(args.out, exist_ok=True)
    active, dict_chars = build_charset(fonts, args.active, rng,
                                       dedupe_fonts=args.dedupe_fonts)
    dict_path = os.path.join(args.out, "char_dict.txt")
    with open(dict_path, "w", encoding="UTF-8") as f:
        f.write("\n".join(dict_chars) + "\n")
    print("active classes: %d, dict size: %d" % (len(active), len(dict_chars)),
          flush=True)
    train_label = generate(args.out, args.train, rng, fonts, active, "train")
    eval_label = generate(args.out, args.eval, rng, fonts, active, "eval")
    print(json.dumps({
        "train_label": train_label, "eval_label": eval_label,
        "char_dict": dict_path, "active_classes": len(active),
    }))


if __name__ == "__main__":
    main()
