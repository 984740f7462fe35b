"""Cross-execution parity: run the REFERENCE's deterministic host ops
(loaded straight from /root/reference, torch-era deps stubbed) against this
repo's TPU-native rebuilds on identical inputs.

These are the ops whose output defines the training/eval data contract —
label encoders and resize/normalize — where silent drift would move
model quality without failing any unit test.  Skipped wholesale when the
reference checkout is absent.
"""

import importlib
import json
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "pytocr")),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def ref():
    """Load reference imaug modules with their unavailable deps stubbed
    (torchvision / pytocr.utils.logging / imgaug are not needed by the ops
    under test) and numpy 1.x aliases restored."""
    if not hasattr(np, "bool"):  # np.bool removed in numpy>=1.24
        np.bool = bool

    def stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    import logging

    stub("pytocr")
    stub("pytocr.utils")
    stub("pytocr.utils.logging", get_logger=lambda *a, **k: logging.getLogger("ref"))
    tv = stub("torchvision")
    tvt = stub("torchvision.transforms")
    tvf = stub("torchvision.transforms.functional")
    tv.transforms = tvt
    tvt.functional = tvf

    # package shell so rec_img_aug's relative `.text_image_aug` resolves
    pkg = types.ModuleType("refimaug")
    pkg.__path__ = [os.path.join(REF, "pytocr", "data", "imaug")]
    sys.modules["refimaug"] = pkg

    # postprocess module loaded flat (it has no relative imports)
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "refimaug_post", os.path.join(REF, "pytocr", "postprocess",
                                      "rec_postprocess.py")
    )
    post = ilu.module_from_spec(spec)
    sys.modules["refimaug_post"] = post
    spec.loader.exec_module(post)

    mods = {}
    for name in ("label_ops", "operators", "rec_img_aug"):
        mods[name] = importlib.import_module("refimaug." + name)
    return mods


def _img(h, w, c=3, seed=0):
    return np.random.RandomState(seed).randint(0, 255, (h, w, c), np.uint8)


def test_det_label_encode_parity(ref):
    from pytorchocr_tpu.data.imaug.label_ops import DetLabelEncode

    label = json.dumps([
        {"points": [[10, 10], [90, 12], [88, 40], [9, 38]], "transcription": "hello"},
        {"points": [[5, 50], [60, 50], [60, 70], [5, 70], [4, 60]],
         "transcription": "###"},
    ])
    theirs = ref["label_ops"].DetLabelEncode(ignore_txt=["*", "###"])(
        {"label": label}
    )
    ours = DetLabelEncode(ignore_txt=["*", "###"])({"label": label})
    np.testing.assert_array_equal(ours["polys"], theirs["polys"])
    assert ours["texts"] == theirs["texts"]
    np.testing.assert_array_equal(ours["ignore_tags"], theirs["ignore_tags"])


def test_ctc_label_encode_parity(ref):
    from pytorchocr_tpu.data.imaug.label_ops import CTCLabelEncode

    dict_path = "pytorchocr_tpu/utils/char_dict_6623.txt"
    kwargs = dict(max_text_length=25, character_dict_path=dict_path,
                  use_space_char=False)
    theirs_op = ref["label_ops"].CTCLabelEncode(**kwargs)
    ours_op = CTCLabelEncode(**kwargs)
    assert list(theirs_op.character) == list(ours_op.character)
    for text in ["hello", "中文混合text", "", "x" * 30]:
        theirs = theirs_op({"label": text})
        ours = ours_op({"label": text})
        if theirs is None or ours is None:
            assert theirs is None and ours is None
            continue
        np.testing.assert_array_equal(ours["label"], theirs["label"])
        assert ours["length"] == theirs["length"]
        if "label_ace" in theirs:
            np.testing.assert_array_equal(ours["label_ace"], theirs["label_ace"])


def test_det_resize_for_test_parity(ref):
    from pytorchocr_tpu.data.imaug.operators import DetResizeForTest

    cases = [
        dict(limit_side_len=736, limit_type="min"),
        dict(limit_side_len=960, limit_type="max"),
        dict(image_shape=[736, 1280]),
        dict(resize_long=960),
    ]
    for kwargs in cases:
        for h, w in [(300, 500), (900, 1600), (736, 736)]:
            img = _img(h, w)
            theirs = ref["operators"].DetResizeForTest(**kwargs)(
                {"image": img.copy()}
            )
            ours = DetResizeForTest(**kwargs)({"image": img.copy()})
            assert ours["image"].shape == theirs["image"].shape, kwargs
            np.testing.assert_array_equal(ours["image"], theirs["image"])
            np.testing.assert_allclose(
                np.asarray(ours["shape"], np.float64),
                np.asarray(theirs["shape"], np.float64),
            )


def test_rec_resize_norm_parity(ref):
    """resize_norm_img: ours is HWC (NHWC pipeline), theirs CHW torch —
    equal after transpose, for gray and color, padded and capped widths."""
    from pytorchocr_tpu.data.imaug.rec_img_aug import resize_norm_img

    for c, shape in [(1, [1, 32, 320]), (3, [3, 32, 320])]:
        for w in [40, 320, 900]:
            img = _img(32, w, 3, seed=w)
            if c == 1:
                import cv2

                img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            theirs = ref["rec_img_aug"].resize_norm_img(img, shape).numpy()
            ours = resize_norm_img(img, shape)
            ours_chw = ours.transpose(2, 0, 1) if ours.ndim == 3 else ours
            np.testing.assert_allclose(ours_chw, theirs, atol=1e-6)


def test_table_label_encode_parity(ref):
    from pytorchocr_tpu.data.imaug.label_ops import TableLabelEncode

    dict_path = "pytorchocr_tpu/utils/table_structure_dict_ch.txt"
    kwargs = dict(max_text_length=100, character_dict_path=dict_path,
                  replace_empty_cell_token=False,
                  merge_no_span_structure=False, learn_empty_box=False,
                  loc_reg_num=4)
    theirs_op = ref["label_ops"].TableLabelEncode(**kwargs)
    ours_op = TableLabelEncode(**kwargs)
    assert list(theirs_op.character) == list(ours_op.character)

    structure = ["<tr>", "<td>", "</td>", "<td", " colspan=\"2\"", ">",
                 "</td>", "</tr>", "<tr>", "<td>", "</td>", "<td>", "</td>",
                 "<td>", "</td>", "</tr>"]
    cells = [
        {"tokens": ["a"], "bbox": [1, 2, 30, 12]},
        {"tokens": ["b"], "bbox": [31, 2, 90, 12]},
        {"tokens": ["c"], "bbox": [1, 13, 30, 24]},
        {"tokens": []},  # empty cell, no bbox
        {"tokens": ["e"], "bbox": [61, 13, 90, 24]},
    ]
    data = {"structure": list(structure),
            "cells": [dict(c) for c in cells],
            "image": _img(32, 96)}
    theirs = theirs_op({"structure": list(structure),
                        "cells": [dict(c) for c in cells],
                        "image": _img(32, 96)})
    ours = ours_op(data)
    if theirs is None or ours is None:
        assert theirs is None and ours is None
        return
    np.testing.assert_array_equal(ours["structure"], theirs["structure"])
    np.testing.assert_allclose(ours["bboxes"], theirs["bboxes"])
    np.testing.assert_array_equal(ours["bbox_masks"], theirs["bbox_masks"])


def test_ctc_label_decode_parity(ref):
    """CTC greedy decode dedup/blank semantics vs the reference, numpy
    path (N,T,C) on both sides, with the 36-char default and explicit
    dict; includes repeated chars separated by blanks."""
    import importlib

    mod = importlib.import_module("refimaug_post")
    from pytorchocr_tpu.postprocess.rec_postprocess import CTCLabelDecode

    theirs_op = mod.CTCLabelDecode()
    ours_op = CTCLabelDecode()
    assert list(theirs_op.character) == list(ours_op.character)

    n_class = len(ours_op.character)
    rng = np.random.RandomState(0)
    # build logits that decode "aa" (via blank separation), "b", ""
    T = 8
    preds = rng.rand(3, T, n_class).astype(np.float32) * 0.1
    a, b = 11, 12  # some char indices
    seqs = [[a, a, 0, a, a, 0, 0, 0], [0, b, b, b, 0, 0, 0, 0], [0] * T]
    for i, seq in enumerate(seqs):
        for t, c in enumerate(seq):
            preds[i, t, c] = 5.0
    theirs = mod.CTCLabelDecode()(preds.copy())
    ours = ours_op(preds.copy())
    assert [t[0] for t in ours] == [t[0] for t in theirs]
    for (txt, conf), (_, ref_conf) in zip(ours, theirs):
        if txt:
            np.testing.assert_allclose(conf, ref_conf, rtol=1e-5)
        else:
            # all-blank line: the reference means an empty list -> NaN
            # confidence; this repo returns 0.0 (deliberate fix)
            assert conf == 0.0 and np.isnan(ref_conf)
