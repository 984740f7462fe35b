"""Deploy layer: checkpoint round-trip + Deter/Recer/Clser/OCRer pipeline on
synthetic images (untrained weights — structure/shape checks only)."""

import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "deploy")))

from pytorchocr_tpu.modeling import build_model
from pytorchocr_tpu.optimizer import build_optimizer
from pytorchocr_tpu.trainer import create_train_state
from pytorchocr_tpu.utils.config import load_config
from pytorchocr_tpu.utils.save_load import save_model

from synth import make_det_dataset, make_rec_dataset

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _write_cfg(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


DET_CFG = """
Global:
  distributed: False
  seed: 1
Architecture:
  model_type: det
  algorithm: DB
  Transform:
  Backbone: {name: ResNet, layers: 18}
  Neck: {name: FPN, out_channels: 64, mode: DB}
  Head: {name: DBHead, k: 50}
PostProcess:
  name: DBPostProcess
  thresh: 0.3
  box_thresh: 0.1
  unclip_ratio: 1.5
  score_mode: box
Eval:
  dataset:
    name: SimpleDataSet
    label_file_list: [dummy]
    transforms:
      - DecodeImage: {img_mode: RGB}
      - DetLabelEncode:
      - DetResizeForTest: {image_shape: [192, 192]}
      - ToTensor:
      - Normalize: {mean: [0.485, 0.456, 0.406], std: [0.229, 0.224, 0.225]}
      - KeepKeys: {keep_keys: [image, shape, polys, ignore_tags]}
  loader: {shuffle: False, batch_size_per_card: 1, num_workers: 1}
"""

REC_CFG = """
Global:
  distributed: False
  seed: 1
  character_dict_path:
  max_text_length: 25
  use_space_char: False
Architecture:
  model_type: rec
  algorithm: CRNN
  in_channels: 1
  Transform:
  Backbone: {name: VGG, model_name: v1, scale: 0.5}
  Neck: {name: SequenceEncoder, encoder_type: rnn, hidden_size: 32}
  Head: {name: CTCHead}
PostProcess:
  name: CTCLabelDecode
Eval:
  dataset:
    name: SimpleDataSet
    label_file_list: [dummy]
    transforms:
      - DecodeImage: {img_mode: GRAY}
      - CTCLabelEncode:
      - RecResizeImg: {image_shape: [1, 32, 96]}
      - KeepKeys: {keep_keys: [image, label, length]}
  loader: {shuffle: False, batch_size_per_card: 8, num_workers: 1}
"""

CLS_CFG = """
Global:
  distributed: False
  seed: 1
  label_list: ["0", "180"]
Architecture:
  model_type: cls
  algorithm: CLS
  Transform:
  Backbone: {name: MobileNetV3, model_name: small, width_mult: 0.35, use_se: True}
  Neck:
  Head: {name: ClsHead, class_dim: 2}
PostProcess:
  name: ClsPostProcess
Eval:
  dataset:
    name: SimpleDataSet
    label_file_list: [dummy]
    transforms:
      - DecodeImage: {img_mode: RGB}
      - ClsLabelEncode:
      - ClsResizeImg: {image_shape: [3, 48, 192]}
      - KeepKeys: {keep_keys: [image, label]}
  loader: {shuffle: False, batch_size_per_card: 8, num_workers: 1}
"""


def _save_ckpt(cfg_path, tmp_path, prefix, example_shape, char_num=None):
    config = load_config(cfg_path)
    if char_num is not None:
        config["Architecture"]["Head"]["out_channels"] = char_num
    model = build_model(config["Architecture"])
    tx, _ = build_optimizer(
        {"base_lr": 1e-3, "optim": {"name": "Adam"}}, epochs=1, step_each_epoch=1
    )
    batch = (np.zeros(example_shape, np.float32),)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    save_model(state, {}, config, str(tmp_path), prefix=prefix)
    return os.path.join(str(tmp_path), prefix)


def test_ocr_pipeline_end_to_end(tmp_path):
    det_cfg = _write_cfg(tmp_path, "det.yml", DET_CFG)
    rec_cfg = _write_cfg(tmp_path, "rec.yml", REC_CFG)
    cls_cfg = _write_cfg(tmp_path, "cls.yml", CLS_CFG)

    det_ckpt = _save_ckpt(det_cfg, tmp_path, "det_ckpt", (1, 64, 64, 3))
    rec_ckpt = _save_ckpt(rec_cfg, tmp_path, "rec_ckpt", (1, 32, 96, 1), char_num=37)
    cls_ckpt = _save_ckpt(cls_cfg, tmp_path, "cls_ckpt", (1, 48, 192, 3))

    label_file = make_det_dataset(str(tmp_path / "imgs"), n=1, size=224)
    img_path = label_file.replace("det_label.txt", "det_0000.png")

    from run_ocr import OCRer

    ocrer = OCRer(det_cfg, det_ckpt, rec_cfg, rec_ckpt, cls_cfg, cls_ckpt)
    result = ocrer.run(img_path)
    assert isinstance(result, list)
    for box, text, prob in result:
        assert box.shape[-1] == 2
        assert isinstance(text, str)
        assert 0.0 <= prob <= 1.0

    # batched multi-page path must agree with the per-page path
    many = ocrer.run_many([img_path, img_path])
    assert len(many) == 2
    for page_res in many:
        assert len(page_res) == len(result)
        for (b1, t1, p1), (b2, t2, p2) in zip(page_res, result):
            np.testing.assert_allclose(np.asarray(b1), np.asarray(b2))
            assert t1 == t2
            np.testing.assert_allclose(p1, p2, rtol=1e-3, atol=1e-3)


def test_aot_and_serialized_export(tmp_path):
    import jax.numpy as jnp
    from common import aot_compile, export_serialized, load_serialized

    def f(x):
        return (x * 2 + 1).sum(axis=-1)

    x = jnp.ones((2, 8), jnp.float32)
    compiled = aot_compile(f, x)
    np.testing.assert_allclose(np.asarray(compiled(x)), np.asarray(f(x)))

    blob = export_serialized(f, x)
    assert isinstance(blob, (bytes, bytearray))
    g = load_serialized(bytes(blob))
    np.testing.assert_allclose(np.asarray(g(x)), np.asarray(f(x)))


def test_show_image_headless_guard(monkeypatch, capsys):
    """--show must not abort in a headless environment (no DISPLAY)."""
    from utils import show_image

    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    show_image("t", np.zeros((4, 4, 3), np.uint8))  # must not raise
    assert "no display" in capsys.readouterr().out


def test_padded_pow2_batch():
    import numpy as np
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "deploy"))
    from common import padded_pow2_batch

    # exact power of two: no padding
    arrs = [np.full((2, 2), i, np.float32) for i in range(4)]
    batch, n = padded_pow2_batch(arrs)
    assert batch.shape == (4, 2, 2) and n == 4
    # off-pow2 pads with the FIRST element up to the next power of two
    batch, n = padded_pow2_batch(arrs[:3])
    assert batch.shape == (4, 2, 2) and n == 3
    assert (batch[3] == arrs[0]).all()
    # single element
    batch, n = padded_pow2_batch(arrs[:1])
    assert batch.shape == (1, 2, 2) and n == 1
    # concatenate mode (per-sample arrays already carry a batch dim)
    arrs_b = [np.full((1, 3), i, np.float32) for i in range(5)]
    batch, n = padded_pow2_batch(arrs_b, combine=np.concatenate)
    assert batch.shape == (8, 3) and n == 5


def test_jitrunner_data_parallel_serving(monkeypatch):
    """On a multi-device host JitRunner shards the batch over a ("data",)
    mesh (deploy/common.py:_dp_mesh): outputs must match the single-device
    runner bit-for-bit in f32, the input must actually be laid out across
    all 8 virtual devices, and non-divisible batches must pad+slice."""
    import jax.numpy as jnp
    from flax import linen as nn
    from common import JitRunner

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(4, (3, 3), dtype=jnp.float32)(x)
            return {"maps": nn.Conv(1, (1, 1), dtype=jnp.float32)(x)}

    model = Tiny()
    x8 = np.random.RandomState(0).rand(8, 16, 16, 3).astype(np.float32)
    variables = jax.device_get(model.init(jax.random.PRNGKey(0), x8[:1]))

    assert len(jax.devices()) == 8  # conftest virtual mesh
    dp = JitRunner(model, dict(variables), mean=[0.5] * 3, std=[0.25] * 3)
    assert dp.mesh is not None and dp.mesh.size == 8

    monkeypatch.setenv("OCR_TPU_DEPLOY_DP", "0")
    single = JitRunner(model, dict(variables), mean=[0.5] * 3, std=[0.25] * 3)
    assert single.mesh is None

    out_dp = dp(x8)["maps"]
    # the jitted call must actually distribute the batch over all devices
    assert len({s.device for s in out_dp.addressable_shards}) == 8
    np.testing.assert_array_equal(
        np.asarray(out_dp), np.asarray(single(x8)["maps"])
    )

    # batch of 3 on 8 devices: padded to 8 inside, sliced back to 3
    out3 = dp(x8[:3])["maps"]
    assert out3.shape[0] == 3
    np.testing.assert_array_equal(
        np.asarray(out3), np.asarray(single(x8[:3])["maps"])
    )
