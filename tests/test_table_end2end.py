"""SLANet table vertical slice: PubTabDataSet -> TableLabelEncode/BoxEncode
-> PPLCNet+CSPPAN+SLAHead -> SLALoss -> train steps -> TableLabelDecode ->
TableMetric."""

import numpy as np

import jax
import jax.numpy as jnp

from pytorchocr_tpu.data import build_dataloader
from pytorchocr_tpu.losses import build_loss
from pytorchocr_tpu.metrics import build_metric
from pytorchocr_tpu.modeling import build_model
from pytorchocr_tpu.optimizer import build_optimizer
from pytorchocr_tpu.parallel.mesh import create_mesh, shard_batch
from pytorchocr_tpu.postprocess import build_post_process
from pytorchocr_tpu.trainer import create_train_state, make_eval_step, make_train_step
from pytorchocr_tpu.utils import get_logger
from pytorchocr_tpu.utils.config import _to_attrdict

from synth import make_pubtab_dataset

MAX_LEN = 24
DICT_PATH = "pytorchocr_tpu/utils/table_structure_dict_ch.txt"


def table_config(label_file):
    transforms = [
        {"DecodeImage": {"img_mode": "RGB"}},
        {"TableLabelEncode": {
            "learn_empty_box": False,
            "merge_no_span_structure": True,
            "replace_empty_cell_token": False,
            "loc_reg_num": 8,
            "max_text_length": MAX_LEN,
        }},
        {"ResizeTableImage": {"max_len": 96, "use_padding": True}},
        {"TableBoxEncode": {"in_box_format": "xyxyxyxy", "out_box_format": "xyxyxyxy"}},
        {"ToTensor": None},
        {"Normalize": {"mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225]}},
        {"KeepKeys": {"keep_keys": ["image", "structure", "bboxes", "bbox_masks", "shape"]}},
    ]
    ds = {
        "name": "PubTabDataSet",
        "label_file_list": [label_file],
        "transforms": transforms,
    }
    return _to_attrdict(
        {
            "Global": {
                "distributed": False,
                "seed": 5,
                "character_dict_path": DICT_PATH,
                "max_text_length": MAX_LEN,
            },
            "Architecture": {
                "model_type": "table",
                "algorithm": "SLANet",
                "Transform": None,
                "Backbone": {"name": "PPLCNet", "scale": 0.5},
                "Neck": {"name": "CSPPAN", "out_channels": 32, "mode": "table"},
                "Head": {"name": "SLAHead", "hidden_size": 32,
                         "max_text_length": MAX_LEN, "loc_reg_num": 8},
            },
            "Loss": {"name": "SLALoss", "structure_weight": 1.0,
                     "loc_weight": 2.0, "loc_loss_type": "smooth_l1"},
            "Optimizer": {"base_lr": 0.001, "optim": {"name": "Adam"}},
            "PostProcess": {"name": "TableLabelDecode",
                            "merge_no_span_structure": True},
            "Metric": {"name": "TableMetric", "main_indicator": "acc",
                       "compute_bbox_metric": False, "del_thead_tbody": True},
            "Train": {"dataset": ds, "loader": {"shuffle": True,
                      "batch_size_per_card": 8, "drop_last": True,
                      "num_workers": 2}},
            "Eval": {"dataset": ds, "loader": {"shuffle": False,
                     "batch_size_per_card": 8, "drop_last": False,
                     "num_workers": 2}},
        }
    )


def test_table_end_to_end(tmp_path):
    label_file = make_pubtab_dataset(str(tmp_path))
    config = table_config(label_file)
    logger = get_logger("test_table")

    loader, _ = build_dataloader(config, "Train", logger, seed=5)
    post = build_post_process(config["PostProcess"], config["Global"])
    char_num = len(post.character)
    config["Architecture"]["Head"]["out_channels"] = char_num

    batches = list(loader)
    b = batches[0]
    image, structure, bboxes, bbox_masks, shape = b
    assert image.shape == (8, 96, 96, 3)
    assert structure.shape == (8, MAX_LEN + 2)
    assert bboxes.shape == (8, MAX_LEN + 2, 8)
    # normalized bbox targets in [0, 1]
    assert bboxes.min() >= 0 and bboxes.max() <= 1.0
    assert bbox_masks.sum() == 8 * 4  # four <td></td> cells per sample

    model = build_model(config["Architecture"])
    loss_fn = build_loss(config["Loss"])
    tx, _ = build_optimizer(config["Optimizer"], epochs=1, step_each_epoch=1)
    mesh = create_mesh()
    state = create_train_state(model, tx, jax.random.PRNGKey(0), b)
    step = make_train_step(model, loss_fn, tx, mesh)
    db = tuple(shard_batch(jnp.asarray(x), mesh) for x in b)
    for i in range(3):
        state, losses = step(state, db)
    assert np.isfinite(float(losses["loss"]))
    assert np.isfinite(float(losses["structure_loss"]))
    assert np.isfinite(float(losses["loc_loss"]))

    # eval: greedy decode + metric plumbing
    eval_step = make_eval_step(model, mesh)
    preds = eval_step(state.params, state.batch_stats, jnp.asarray(b[0]))
    assert preds["structure_probs"].shape == (8, MAX_LEN + 1, char_num)
    post_result = post(
        {"structure_probs": preds["structure_probs"], "loc_preds": preds["loc_preds"]},
        list(b),
    )
    metric = build_metric(config["Metric"])
    metric(post_result, b)
    out = metric.get_metric()
    assert 0.0 <= out["acc"] <= 1.0


def _levenshtein_ref(a, b):
    # textbook O(nm) reference implementation
    dp = list(range(len(b) + 1))
    for i, ta in enumerate(a):
        ndp = [i + 1]
        for j, tb in enumerate(b):
            ndp.append(min(dp[j + 1] + 1, ndp[j] + 1, dp[j] + (ta != tb)))
        dp = ndp
    return dp[-1]


def test_token_edit_distance_matches_reference():
    import random

    from pytorchocr_tpu.metrics.table_metric import _token_edit_distance

    rng = random.Random(0)
    toks = ["<tr>", "</tr>", "<td>", "</td>", "<td", ' colspan="2"', ">"]
    for _ in range(50):
        a = [rng.choice(toks) for _ in range(rng.randrange(0, 30))]
        b = [rng.choice(toks) for _ in range(rng.randrange(0, 30))]
        assert _token_edit_distance(a, b) == _levenshtein_ref(a, b)


def test_table_structure_metric_token_acc_diagnostic():
    """One wrong token zeroes exact-match `acc` but leaves `token_acc`
    high — the diagnostic separating metric harshness from a broken
    decoder (QUALITY.md SLANet analysis)."""
    from pytorchocr_tpu.metrics.table_metric import TableStructureMetric

    gt = ["<tr>", "<td>", "</td>", "<td>", "</td>", "</tr>"] * 4
    pred = list(gt)
    pred[5] = "<td>"  # single token wrong
    metric = TableStructureMetric()
    metric((
        {"structure_batch_list": [(pred, None)]},
        {"structure_batch_list": [gt]},
    ))
    out = metric.get_metric()
    assert out["acc"] < 1e-3
    assert out["token_acc"] > 0.9
    # exact match still scores 1.0 / 1.0
    metric((
        {"structure_batch_list": [(gt, None)]},
        {"structure_batch_list": [gt]},
    ))
    out = metric.get_metric()
    assert abs(out["acc"] - 1.0) < 1e-3
    assert abs(out["token_acc"] - 1.0) < 1e-6


def test_sla_scheduled_sampling_and_label_smoothing():
    """scheduled_sampling_p>0 with a "sample" rng: same param tree as pure
    teacher forcing, different train-mode logits (own predictions fed for
    ~p of the steps); without the rng it falls back to teacher forcing.
    SLALoss label_smoothing>0 raises CE on a perfect prediction (soft
    targets) but keeps the argmin at the target."""
    from pytorchocr_tpu.losses.table_att_loss import SLALoss
    from pytorchocr_tpu.modeling.heads.table_att_head import SLAHead

    n, h, w, c, n_cls, T = 2, 4, 6, 16, 12, 10
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c))
    structure = jax.random.randint(jax.random.PRNGKey(1), (n, T + 2), 0, n_cls)
    data = [None, structure]

    tf_head = SLAHead(in_channels=c, hidden_size=24, out_channels=n_cls,
                      max_text_length=T, scheduled_sampling_p=0.0)
    ss_head = SLAHead(in_channels=c, hidden_size=24, out_channels=n_cls,
                      max_text_length=T, scheduled_sampling_p=0.9)
    v_tf = tf_head.init(jax.random.PRNGKey(2), x, targets=data, train=True)
    v_ss = ss_head.init(jax.random.PRNGKey(2), x, targets=data, train=True)
    assert jax.tree.structure(v_tf) == jax.tree.structure(v_ss)

    out_tf = tf_head.apply(v_tf, x, targets=data, train=True)
    # without a "sample" rng: scheduled sampling is inert -> identical
    out_ss_norng = ss_head.apply(v_tf, x, targets=data, train=True)
    np.testing.assert_allclose(
        out_tf["structure_probs"], out_ss_norng["structure_probs"], atol=1e-6
    )
    # with the rng: p=0.9 must change the fed tokens -> different logits
    out_ss = ss_head.apply(
        v_tf, x, targets=data, train=True,
        rngs={"sample": jax.random.PRNGKey(3)},
    )
    assert not np.allclose(
        out_tf["structure_probs"], out_ss["structure_probs"], atol=1e-6
    )
    # eval mode ignores scheduled sampling entirely
    e1 = tf_head.apply(v_tf, x, train=False)
    e2 = ss_head.apply(v_tf, x, train=False)
    np.testing.assert_allclose(e1["structure_probs"], e2["structure_probs"],
                               atol=1e-6)

    # label smoothing
    logits = jnp.full((1, 3, 5), -10.0).at[0, :, 2].set(10.0)
    tgt = jnp.full((1, 4), 2, jnp.int32)
    batch = [None, tgt,
             jnp.zeros((1, 4, 8), jnp.float32), jnp.zeros((1, 4, 8), jnp.float32)]
    preds = {"structure_probs": logits, "loc_preds": jnp.zeros((1, 3, 8))}
    plain = SLALoss(1.0, 2.0)(preds, batch)
    smooth = SLALoss(1.0, 2.0, label_smoothing=0.1)(preds, batch)
    assert float(smooth["structure_loss"]) > float(plain["structure_loss"])


def test_table_label_encode_row_col_counts():
    """TableLabelEncode emits row_cnt (# closed <tr>) and col_cnt (first
    row's column count, colspan-widened) for the SLAHead aux_count
    supervision."""
    from pytorchocr_tpu.data.imaug.label_ops import TableLabelEncode

    op = TableLabelEncode(
        max_text_length=MAX_LEN, character_dict_path=DICT_PATH,
        merge_no_span_structure=True, loc_reg_num=8,
    )
    structure = ["<thead>", "<tr>", "<td></td>", "<td></td>", "</tr>",
                 "</thead>", "<tbody>", "<tr>", "<td></td>", "<td></td>",
                 "</tr>", "<tr>", "<td></td>", "<td></td>", "</tr>",
                 "</tbody>"]
    cells = [{"tokens": []} for _ in range(6)]
    out = op({"structure": structure, "cells": cells})
    assert int(out["row_cnt"]) == 3
    assert int(out["col_cnt"]) == 2

    # colspan widens the first-row count: <td colspan="3"> + <td></td> = 4
    structure2 = ["<tbody>", "<tr>", "<td", ' colspan="3"', ">",
                  "<td></td>", "</tr>", "</tbody>"]
    cells2 = [{"tokens": []} for _ in range(2)]
    out2 = op({"structure": structure2, "cells": cells2})
    assert int(out2["row_cnt"]) == 1
    assert int(out2["col_cnt"]) == 4


def test_sla_aux_count_branch():
    """aux_count=True adds row/col-count logits and a count-conditioned
    decoder init; SLALoss aux_count_weight>0 supervises them from
    batch[4]/batch[5] (round-5 fix for the row/col miscount failure
    mode)."""
    from pytorchocr_tpu.losses.table_att_loss import SLALoss
    from pytorchocr_tpu.modeling.heads.table_att_head import SLAHead

    n, h, w, c, n_cls, T = 2, 4, 6, 16, 12, 10
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c))
    structure = jax.random.randint(jax.random.PRNGKey(1), (n, T + 2), 0, n_cls)
    data = [None, structure]

    head = SLAHead(in_channels=c, hidden_size=24, out_channels=n_cls,
                   max_text_length=T, aux_count=True)
    v = head.init(jax.random.PRNGKey(2), x, targets=data, train=True)
    out = head.apply(v, x, targets=data, train=True)
    assert out["row_logits"].shape == (n, 32)
    assert out["col_logits"].shape == (n, 32)
    # eval mode emits them too (harmless extra keys for the postprocess)
    out_e = head.apply(v, x, train=False)
    assert out_e["row_logits"].shape == (n, 32)

    preds = {
        "structure_probs": out["structure_probs"],
        "loc_preds": jnp.zeros((n, T + 1, 8)),
        "row_logits": out["row_logits"],
        "col_logits": out["col_logits"],
    }
    batch = [None, structure,
             jnp.zeros((n, T + 2, 8), jnp.float32),
             jnp.zeros((n, T + 2, 8), jnp.float32),
             jnp.asarray([3, 5], jnp.int32),   # row_cnt
             jnp.asarray([2, 4], jnp.int32)]   # col_cnt
    plain = SLALoss(1.0, 2.0)(preds, batch)
    with_aux = SLALoss(1.0, 2.0, aux_count_weight=1.0)(preds, batch)
    assert "count_loss" in with_aux
    assert np.isfinite(float(with_aux["count_loss"]))
    assert float(with_aux["loss"]) > float(plain["loss"])
