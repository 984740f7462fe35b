"""Shape-bucketed batched evaluate() parity (tools/program.py).

The fast path groups bs-1 eval samples by exact post-resize shape and
forwards padded-pow2 batches; because only the batch axis is stacked the
per-sample results must be identical to the per-batch (bs-1) reference
loop (reference eval loop: /root/reference/tools/program.py:421-473).
These tests drive evaluate() with a deterministic stub eval_step so the
parity claim is checked end to end (grouping, pow2 padding, overlap,
slicing, metric feed order) without training a model.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.append(str(Path(__file__).resolve().parents[1] / "tools"))

import program  # noqa: E402
from pytorchocr_tpu.metrics import build_metric  # noqa: E402
from pytorchocr_tpu.parallel.mesh import create_mesh  # noqa: E402
from pytorchocr_tpu.postprocess import build_post_process  # noqa: E402


class _StubState:
    params = {}
    batch_stats = {}


def _stub_eval_step(params, batch_stats, images):
    # deterministic "model": prob map = mean channel intensity
    maps = np.asarray(images, dtype=np.float32).mean(axis=-1, keepdims=True)
    return {"maps": maps}


def _mk_sample(h, w, boxes):
    """bs-1 det eval batch: blob image + shape list + GT polys + tags."""
    img = np.zeros((1, h, w, 3), dtype=np.float32)
    polys = []
    for (x0, y0, x1, y1) in boxes:
        img[0, y0:y1, x0:x1, :] = 0.9
        polys.append([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
    shape = np.array([[h, w, 1.0, 1.0]], dtype=np.float32)
    polys = np.array([polys], dtype=np.float32)
    tags = np.zeros((1, len(boxes)), dtype=bool)
    return (img, shape, polys, tags)


def _make_samples():
    rng = np.random.RandomState(7)
    samples = []
    # two shape buckets, 11 + 5 samples -> chunks of 8+2+1 and 4+1 pow2 pads
    for shapes, count in ((((160, 192)), 11), (((128, 256)), 5)):
        h, w = shapes
        for _ in range(count):
            n = rng.randint(1, 4)
            boxes = []
            for _ in range(n):
                x0 = rng.randint(0, w - 60)
                y0 = rng.randint(0, h - 40)
                boxes.append((x0, y0, x0 + rng.randint(30, 55),
                              y0 + rng.randint(20, 36)))
            samples.append(_mk_sample(h, w, boxes))
    rng.shuffle(samples)  # interleave the two shape buckets
    return samples


def _components():
    post = build_post_process(
        {
            "name": "DBPostProcess",
            "thresh": 0.3,
            "box_thresh": 0.5,
            "max_candidates": 100,
            "unclip_ratio": 0.4,
            "score_mode": "poly",
        },
        {},
    )
    metric = build_metric({"name": "DetMetric", "main_indicator": "hmean"})
    return post, metric


def test_batched_evaluate_matches_bs1_reference():
    samples = _make_samples()
    mesh = create_mesh()

    # reference: the plain per-batch loop (force it by claiming model_type
    # table is not applicable — run inline instead of through evaluate so
    # the reference stays the pre-bucketing semantics)
    post, metric = _components()
    for b in samples:
        preds = _stub_eval_step({}, {}, b[0])
        post_result = post(preds, b[1])
        metric(post_result, b)
    ref = metric.get_metric()

    post, metric = _components()
    got = program.evaluate(
        _StubState(), _stub_eval_step, mesh, list(samples), post, metric,
        model_type="det",
    )
    assert got.pop("fps") > 0
    for k, v in ref.items():
        assert got[k] == v, (k, got[k], v)
    # sanity: the stub actually detects something (non-degenerate parity)
    assert ref["hmean"] > 0.5


def test_batched_evaluate_heartbeat_per_chunk():
    samples = _make_samples()
    mesh = create_mesh()
    beats = []
    post, metric = _components()
    program.evaluate(
        _StubState(), _stub_eval_step, mesh, list(samples), post, metric,
        model_type="det", heartbeat=lambda: beats.append(1),
    )
    # one beat per chunk: 11-sample bucket + 5-sample bucket, MAX_BS=16
    assert len(beats) == 2


def test_batched_evaluate_prebatched_loader_uses_per_batch_path():
    # a loader whose first batch has bs>1 must take the per-batch path
    mesh = create_mesh()
    post, metric = _components()
    s1 = _mk_sample(64, 96, [(10, 10, 50, 40)])
    b = tuple(np.concatenate([a, a], axis=0) for a in s1)
    got = program.evaluate(
        _StubState(), _stub_eval_step, mesh, [b], post, metric,
        model_type="det",
    )
    assert got["hmean"] > 0.5


def test_slice_post_dict():
    pr = {"Student": ["a", "b"], "Teacher": ["c", "d"]}
    assert program._slice_post(pr, 1) == {"Student": ["b"], "Teacher": ["d"]}
    assert program._slice_post(["x", "y"], 0) == ["x"]


def test_batched_evaluate_distillation_dict_contract():
    """DistillationModel eval: preds are {model: {"maps": ...}}, the
    postprocess returns {model: per-sample boxes}, DistillationMetric
    accumulates per model — the bucketed path must slice and feed that
    dict shape identically to the bs-1 loop."""
    from pytorchocr_tpu.metrics import build_metric
    from pytorchocr_tpu.postprocess import build_post_process

    def stub_eval_step(params, batch_stats, images):
        maps = np.asarray(images, dtype=np.float32).mean(axis=-1, keepdims=True)
        return {"Student": {"maps": maps}, "Student2": {"maps": maps * 0.9}}

    def components():
        post = build_post_process(
            {
                "name": "DistillationDBPostProcess",
                "model_name": ["Student", "Student2"],
                "thresh": 0.3,
                "box_thresh": 0.5,
                "max_candidates": 100,
                "unclip_ratio": 0.4,
                "score_mode": "poly",
            },
            {},
        )
        metric = build_metric(
            {
                "name": "DistillationMetric",
                "base_metric_name": "DetMetric",
                "main_indicator": "hmean",
                "keys": ["Student", "Student2"],
            }
        )
        return post, metric

    samples = _make_samples()
    mesh = create_mesh()

    post, metric = components()
    for b in samples:
        preds = stub_eval_step({}, {}, b[0])
        metric(post(preds, b[1]), b)
    ref = metric.get_metric()

    post, metric = components()
    got = program.evaluate(
        _StubState(), stub_eval_step, mesh, list(samples), post, metric,
        model_type="det",
    )
    assert got.pop("fps") > 0
    for k, v in ref.items():
        assert got[k] == v, (k, got[k], v)
    assert ref["hmean"] > 0.5
