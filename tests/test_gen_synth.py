"""QUALITY.md benchmark generators: seeded -> byte-reproducible, labels
well-formed.  Guards the repro commands in QUALITY.md (same seed must
regenerate the same benchmark, or the published numbers aren't anchored)."""

import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
GEN_DIR = os.path.join(REPO, "tools", "data")


def _run_gen(script, out, n_train=3, n_eval=2, seed=7, extra=()):
    subprocess.run(
        [
            sys.executable, os.path.join(GEN_DIR, script),
            "--out", str(out), "--train", str(n_train), "--eval", str(n_eval),
            "--seed", str(seed), *extra,
        ],
        cwd=GEN_DIR, check=True, capture_output=True, text=True, timeout=300,
    )


def _tree_digest(root):
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for name in sorted(filenames):
            p = os.path.join(dirpath, name)
            h.update(os.path.relpath(p, root).encode())
            with open(p, "rb") as f:
                data = f.read()
            # label files embed absolute paths; normalize before hashing
            if name.endswith((".txt", ".jsonl")):
                data = data.replace(str(root).encode(), b"ROOT")
            h.update(hashlib.sha256(data).digest())
    return h.hexdigest()


def _check_generator(script, tmp_path, label_checker):
    a, b = tmp_path / "a", tmp_path / "b"
    _run_gen(script, a)
    _run_gen(script, b)
    da, db = _tree_digest(a), _tree_digest(b)
    assert da == db, "%s is not deterministic for a fixed seed" % script
    train_label = os.path.join(a, "train_label.txt")
    with open(train_label) as f:
        lines = [l.rstrip("\n") for l in f if l.strip()]
    assert len(lines) == 3
    for line in lines:
        path, label = line.split("\t", 1)
        assert os.path.exists(path), path
        label_checker(label)


def test_gen_synth_det_deterministic(tmp_path):
    def check(label):
        boxes = json.loads(label)
        assert boxes and all(len(b["points"]) == 4 for b in boxes)
        assert all("transcription" in b for b in boxes)

    _check_generator("gen_synth_det.py", tmp_path, check)


def test_gen_synth_det_shifted_style_differs_and_is_deterministic(tmp_path):
    """--style shifted must be (a) seeded-deterministic like base and
    (b) an actually different rendering distribution for the same seed."""
    a, b, base = tmp_path / "a", tmp_path / "b", tmp_path / "base"
    _run_gen("gen_synth_det.py", a, extra=("--style", "shifted"))
    _run_gen("gen_synth_det.py", b, extra=("--style", "shifted"))
    _run_gen("gen_synth_det.py", base)
    assert _tree_digest(a) == _tree_digest(b)
    assert _tree_digest(a) != _tree_digest(base)
    # shifted pages are mid-gray (bg 150-195), base pages near-white
    import numpy as np
    from PIL import Image

    shifted_img = np.asarray(
        Image.open(os.path.join(a, "train", "train_00000.png")).convert("L")
    )
    base_img = np.asarray(
        Image.open(os.path.join(base, "train", "train_00000.png")).convert("L")
    )
    assert np.median(shifted_img) < 210 < np.median(base_img)


def test_gen_synth_rec_deterministic(tmp_path):
    def check(label):
        assert label and all(c.isalnum() for c in label)

    _check_generator("gen_synth_rec.py", tmp_path, check)


def test_gen_synth_cls_deterministic(tmp_path):
    def check(label):
        assert label in ("0", "180")

    _check_generator("gen_synth_cls.py", tmp_path, check)


def test_gen_synth_table_deterministic(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    _run_gen("gen_synth_table.py", a)
    _run_gen("gen_synth_table.py", b)
    assert _tree_digest(a) == _tree_digest(b), (
        "gen_synth_table.py is not deterministic for a fixed seed"
    )
    with open(os.path.join(a, "train_label.jsonl")) as f:
        lines = [l for l in f if l.strip()]
    assert len(lines) == 3
    td_tokens = {"<td>", "<td"}
    for line in lines:
        rec = json.loads(line)
        assert os.path.exists(rec["img_path"])
        cells = rec["html"]["cells"]
        structure = rec["html"]["structure"]["tokens"]
        # one cell record per td open token, in order (PubTabNet invariant
        # TableLabelEncode relies on, label_ops.py TableLabelEncode.__call__)
        n_td = sum(1 for t in structure if t in td_tokens)
        assert n_td == len(cells)
        for c in cells:
            if c["tokens"]:
                assert len(c["bbox"]) == 8  # xyxyxyxy, loc_reg_num=8
            else:
                assert "bbox" not in c
        # structure tokens must all be encodable by the shipped dict
        assert "<thead>" == structure[0] and structure[-1] == "</tbody>"


def test_gen_synth_rec_bigvocab_deterministic(tmp_path):
    """Big-vocab generator: deterministic, dict == packaged copy, labels
    drawn from the active (renderable, glyph-deduped) charset."""
    a, b = tmp_path / "a", tmp_path / "b"
    extra = ("--active", "200")
    _run_gen("gen_synth_rec_bigvocab.py", a, extra=extra)
    _run_gen("gen_synth_rec_bigvocab.py", b, extra=extra)
    assert _tree_digest(a) == _tree_digest(b)

    with open(os.path.join(a, "char_dict.txt"), encoding="UTF-8") as f:
        dict_chars = [l.rstrip("\n") for l in f if l.rstrip("\n")]
    assert len(dict_chars) == 6622  # reference protocol width (6623 w/ blank)
    assert len(set(dict_chars)) == 6622

    with open(os.path.join(a, "train_label.txt"), encoding="UTF-8") as f:
        lines = [l.rstrip("\n") for l in f if l.strip()]
    assert len(lines) == 3
    charset = set(dict_chars)
    for line in lines:
        path, label = line.split("\t", 1)
        assert os.path.exists(path)
        assert 2 <= len(label) <= 8
        assert all(c in charset for c in label)

    # the packaged dict (what the config loads) must agree with the
    # full-size generator output (default --dedupe_fonts all — the
    # packaged dict is the r4 v2 refresh) on this host's fonts
    import subprocess as sp
    full = tmp_path / "full"
    sp.run(
        [sys.executable, os.path.join(GEN_DIR, "gen_synth_rec_bigvocab.py"),
         "--out", str(full), "--train", "0", "--eval", "0", "--seed", "2022"],
        cwd=GEN_DIR, check=True, capture_output=True, timeout=300,
    )
    with open(os.path.join(full, "char_dict.txt"), encoding="UTF-8") as f:
        gen_dict = f.read()
    with open(os.path.join(REPO, "pytorchocr_tpu", "utils",
                           "char_dict_bigvocab.txt"), encoding="UTF-8") as f:
        packaged = f.read()
    assert gen_dict == packaged


def test_bigvocab_multi_font_dedupe_kills_cross_font_homoglyphs():
    """--dedupe_fonts all (the default): a char pair distinct in fonts[0]
    but pixel-identical in another render face keeps only one member
    ('3'/'З' collide in DejaVuSansMono; '*'/'∗' likewise)."""
    sys.path.insert(0, GEN_DIR)
    try:
        from gen_synth_det import _fonts
        from gen_synth_rec_bigvocab import (
            _dedupe_by_glyph,
            _dedupe_by_glyph_all_fonts,
        )
    finally:
        sys.path.remove(GEN_DIR)
    fonts = _fonts()
    chars = ["3", "З", "*", "∗", "a", "b"]
    single = _dedupe_by_glyph(chars, fonts[0])
    multi = _dedupe_by_glyph_all_fonts(chars, fonts)
    # distinct in the first face -> single-font dedupe keeps both
    assert "3" in single and "З" in single
    # identical in the mono face -> multi-font dedupe keeps the first only
    assert "3" in multi and "З" not in multi
    assert "*" in multi and "∗" not in multi
    assert {"a", "b"} <= set(multi)
