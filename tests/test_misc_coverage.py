"""Coverage for remaining small surfaces: Attn/Distillation decoders,
TableMetric bbox path, padded-resize rescale, sort_boxes, top-level API."""

import numpy as np

import jax.numpy as jnp


def test_attn_label_decode_eos():
    from pytorchocr_tpu.postprocess.rec_postprocess import AttnLabelDecode

    dec = AttnLabelDecode(character_dict_path=None)
    # dict: [sos] 0-9a-z [eos]; eos idx = 37
    C = len(dec.character)
    T = 6
    probs = np.zeros((1, T, C), np.float32)
    seq = [1, 2, dec.dict["eos"], 5, 5, 5]  # decode must stop at eos
    for t, c in enumerate(seq):
        probs[0, t, c] = 1.0
    out = dec(probs)
    assert out[0][0] == "01"


def test_distillation_ctc_label_decode():
    from pytorchocr_tpu.postprocess.rec_postprocess import DistillationCTCLabelDecode

    dec = DistillationCTCLabelDecode(
        character_dict_path=None, model_name=["Student", "Student2"]
    )
    probs = np.zeros((1, 4, 40), np.float32)
    probs[0, 0, 1] = 1.0
    probs[0, 1:, 0] = 1.0
    preds = {"Student": probs, "Student2": probs}
    out = dec(preds)
    assert out["Student"][0][0] == "0" and out["Student2"][0][0] == "0"


def test_table_metric_bbox_path():
    from pytorchocr_tpu.metrics import build_metric

    metric = build_metric(
        {"name": "TableMetric", "main_indicator": "acc",
         "compute_bbox_metric": True, "box_format": "xyxy"}
    )
    preds = {
        "structure_batch_list": [[["<tr>", "<td>", "</td>", "</tr>"], 0.9]],
        "bbox_batch_list": [[np.array([0, 0, 10, 10], np.float32)]],
    }
    labels = {
        "structure_batch_list": [["<tr>", "<td>", "</td>", "</tr>"]],
        "bbox_batch_list": [[np.array([0, 0, 10, 10], np.float32)]],
    }
    metric((preds, labels))
    out = metric.get_metric()
    assert out["acc"] > 0.99
    assert "bbox_metric_hmean" in out
    assert out["bbox_metric_hmean"] > 0.99


def test_db_padding_resize_rescale():
    """use_padding_resize inverse-affine path (reference transform_preds)."""
    from pytorchocr_tpu.postprocess.db_postprocess import DBPostProcess

    prob = np.zeros((1, 128, 128, 1), np.float32)
    # the source image is 200x100 padded into the 128-square: content scale
    # = 128/200; a blob placed where a (40..120)x(20..40) source box lands
    sx = 128 / 200.0
    x0, x1 = int(40 * sx), int(120 * sx)
    y0, y1 = int((20 + 50) * sx), int((40 + 50) * sx)  # y offset (200-100)/2
    prob[0, y0:y1, x0:x1, 0] = 0.9
    post = DBPostProcess(thresh=0.3, box_thresh=0.3, unclip_ratio=1.0,
                         score_mode="box")
    res = post({"maps": prob}, [[100, 200, sx, sx]], use_padding_resize=True)
    assert len(res[0]["points"]) == 1
    box = np.asarray(res[0]["points"][0])
    # mapped back into the 200x100 source frame
    assert 20 <= box[:, 0].min() <= 60 and 100 <= box[:, 0].max() <= 140
    assert 5 <= box[:, 1].min() <= 35 and 25 <= box[:, 1].max() <= 55


def test_sort_boxes_reading_order():
    from pytorchocr_tpu.utils.utility import sort_boxes

    boxes = np.array([
        [[50, 12], [90, 12], [90, 30], [50, 30]],   # line 1 right
        [[10, 10], [40, 10], [40, 30], [10, 30]],   # line 1 left
        [[10, 60], [40, 60], [40, 80], [10, 80]],   # line 2
    ], np.float32)
    out = sort_boxes(boxes)
    assert out[0][0][0] == 10 and out[0][0][1] == 10
    assert out[1][0][0] == 50
    assert out[2][0][1] == 60


def test_top_level_api():
    import pytorchocr_tpu as m

    model = m.build_model(
        {"model_type": "cls", "algorithm": "CLS", "Transform": None,
         "Backbone": {"name": "MobileNetV3", "model_name": "small",
                      "width_mult": 0.35},
         "Neck": None, "Head": {"name": "ClsHead", "class_dim": 2}}
    )
    assert model is not None
    assert m.build_metric({"name": "ClsMetric"}).main_indicator == "acc"


def test_resize_nearest_exact():
    """resize_nearest (depthwise input-dilated conv) is elementwise-exact
    nearest upsampling for every scale the necks use, f32 and bf16."""
    import jax.numpy as jnp
    import numpy as np

    from pytorchocr_tpu.modeling.common import resize_nearest

    rng = np.random.RandomState(0)
    for scale in (1, 2, 4, 8):
        for dtype in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.rand(2, 5, 7, 3).astype(np.float32)).astype(dtype)
            got = resize_nearest(x, scale)
            want = jnp.repeat(jnp.repeat(x, scale, axis=1), scale, axis=2)
            assert got.shape == want.shape
            assert got.dtype == x.dtype
            np.testing.assert_array_equal(
                np.asarray(got.astype(jnp.float32)),
                np.asarray(want.astype(jnp.float32)),
            )


def test_fused_bilstm_matches_reference_lstm():
    """The fused direction-batched BiLSTM equals two independent textbook
    LSTMs (numpy, f32) run forward and backward over the sequence."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorchocr_tpu.modeling.necks.rnn import BiLSTM

    N, T, C, H = 2, 7, 5, 4
    rng = np.random.RandomState(0)
    x = rng.randn(N, T, C).astype(np.float32)

    m = BiLSTM(hidden_size=H)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(variables, jnp.asarray(x)))

    p = jax.tree.map(np.asarray, variables["params"])
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))

    def run_lstm(xseq, wi, wh, b):
        h = np.zeros((xseq.shape[0], H), np.float32)
        c = np.zeros_like(h)
        out = []
        for t in range(xseq.shape[1]):
            gates = xseq[:, t] @ wi + h @ wh + b
            i, f, g, o = np.split(gates, 4, axis=-1)
            c = sig(f) * c + sig(i) * np.tanh(g)
            h = sig(o) * np.tanh(c)
            out.append(h)
        return np.stack(out, axis=1)

    fwd = run_lstm(x, p["wi"][0], p["wh"][0], p["b"][0])
    bwd = run_lstm(x[:, ::-1], p["wi"][1], p["wh"][1], p["b"][1])[:, ::-1]
    want = np.concatenate([fwd, bwd], axis=-1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bilstm_checkpoint_migration_prefusion_layout():
    """Checkpoints saved by the pre-fusion BiLSTM (nn.RNN over
    OptimizedLSTMCell per direction) restore onto the fused wi/wh/b layout
    through save_load.migrate_fused_bilstm with numerically identical
    outputs (ADVICE round-1: silent restore break on the param rename)."""
    import jax
    import flax.linen as nn

    from pytorchocr_tpu.modeling.necks.rnn import BiLSTM
    from pytorchocr_tpu.utils.save_load import migrate_fused_bilstm

    N, T, C, H = 2, 6, 5, 4

    class OldBiLSTM(nn.Module):
        hidden_size: int = H

        @nn.compact
        def __call__(self, x):
            fwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size, param_dtype=jnp.float32),
                name="fwd",
            )
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size, param_dtype=jnp.float32),
                reverse=True,
                keep_order=True,
                name="bwd",
            )
            return jnp.concatenate([fwd(x), bwd(x)], axis=-1)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(N, T, C).astype(np.float32))
    old = OldBiLSTM()
    old_vars = old.init(jax.random.PRNGKey(3), x)
    want = np.asarray(old.apply(old_vars, x))

    # nest the old cells one level down to prove the walk recurses like a
    # real checkpoint tree (neck/encoder/lstm0/...)
    old_tree = {"neck": {"lstm0": jax.tree.map(np.asarray, old_vars["params"])}}
    migrated = migrate_fused_bilstm(old_tree)
    p = migrated["neck"]["lstm0"]
    assert set(p.keys()) == {"wi", "wh", "b"}
    assert p["wi"].shape == (2, C, 4 * H)
    assert p["wh"].shape == (2, H, 4 * H)
    assert p["b"].shape == (2, 4 * H)

    got = np.asarray(BiLSTM(hidden_size=H).apply({"params": p}, x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_checkpoint_save_staged_swap_and_old_fallback(tmp_path):
    """save_model must never leave a window with no restorable checkpoint:
    it stages into <prefix>.staging and swaps (so a crash mid-save keeps
    the previous `latest`), writes global_state.json BEFORE the swap, and
    load_model falls back to <prefix>.old when only the mid-swap remnant
    survives."""
    import os
    import jax
    import optax

    from pytorchocr_tpu.trainer import TrainState
    from pytorchocr_tpu.utils.save_load import load_model, save_model

    params = {"w": jnp.ones((4, 4), jnp.float32)}
    tx = optax.adam(1e-3)
    state = TrainState(
        params=params,
        batch_stats={},
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    d = str(tmp_path)
    save_model(state, {"start_epoch": 3, "best_model": {"acc": 0.5},
                       "global_step": 30}, {}, d, prefix="latest")
    path = os.path.join(d, "latest")
    assert os.path.isdir(path)
    assert not os.path.isdir(path + ".staging")
    assert not os.path.isdir(path + ".old")
    # metadata finalized with the checkpoint, not after it
    assert os.path.exists(os.path.join(path, "global_state.json"))

    # second save replaces the first in place
    state2 = state.replace(params={"w": jnp.full((4, 4), 2.0)},
                           step=jnp.asarray(1, jnp.int32))
    save_model(state2, {"start_epoch": 4, "best_model": {"acc": 0.6},
                        "global_step": 40}, {}, d, prefix="latest")
    cfg = {"Global": {"checkpoints": path, "pretrained_model": None}}
    restored, gs = load_model(cfg, state)
    assert float(restored.params["w"][0, 0]) == 2.0
    assert gs["start_epoch"] == 4

    # crash between the two renames of the swap: only `.old` survives
    os.rename(path, path + ".old")
    restored, gs = load_model(cfg, state)
    assert float(restored.params["w"][0, 0]) == 2.0
    assert gs["global_step"] == 40


def test_table_box_encode_formats():
    """TableBoxEncode format conversions are per-box (the reference's
    xyxyxyxy->xywh reduces over the whole array — label_ops.py:502-508 —
    collapsing every box to one rectangle; fixed here) and normalize to
    the resized image."""
    from pytorchocr_tpu.data.imaug.label_ops import TableBoxEncode

    # two distinct quads
    quads = np.array([
        [0, 0, 10, 0, 10, 4, 0, 4],
        [20, 10, 40, 10, 40, 30, 20, 30],
    ], np.float32)
    shape = np.array([100, 100, 1.0, 1.0, 100, 100], np.float32)
    op = TableBoxEncode(in_box_format="xyxyxyxy", out_box_format="xywh")
    out = op({"shape": shape, "bboxes": quads.copy()})["bboxes"]
    np.testing.assert_allclose(out[0] * 100, [0, 0, 10, 4], atol=1e-5)
    np.testing.assert_allclose(out[1] * 100, [20, 10, 20, 20], atol=1e-5)

    # xyxy -> xywh is center-format, scaled by resize ratios
    boxes = np.array([[10, 20, 30, 60]], np.float32)
    shape = np.array([100, 100, 0.5, 2.0, 50, 200], np.float32)
    op = TableBoxEncode(in_box_format="xyxy", out_box_format="xywh")
    out = op({"shape": shape, "bboxes": boxes.copy()})["bboxes"]
    # cx=20,cy=40,w=20,h=40 -> *ratio(w=2,h=.5) -> /dst(200,50)
    np.testing.assert_allclose(out[0], [40/200, 20/50, 40/200, 20/50], atol=1e-5)
