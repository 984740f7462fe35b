"""PSE/PAN: propagation ops (BFS-equivalence), losses, postprocess."""

import numpy as np

import jax
import jax.numpy as jnp

from pytorchocr_tpu.ops.propagate import pa_np, pse_np, spread_labels_jax


def test_pse_expansion_two_instances():
    """Two separated kernels expand into their text regions without merging."""
    H = W = 40
    text = np.zeros((H, W), np.uint8)
    text[5:15, 5:35] = 1   # instance A region
    text[25:35, 5:35] = 1  # instance B region
    small = np.zeros_like(text)
    small[8:12, 10:30] = 1
    small[28:32, 10:30] = 1
    kernels = np.stack([text, small])  # big..small
    label = pse_np(kernels, min_area=0)
    # labels fill the text regions
    a = label[10, 20]
    b = label[30, 20]
    assert a > 0 and b > 0 and a != b
    assert (label[5:15, 5:35] == a).all()
    assert (label[25:35, 5:35] == b).all()
    assert (label[16:24, :] == 0).all()  # gap stays background


def test_pse_min_area_filter():
    H = W = 16
    text = np.zeros((H, W), np.uint8)
    text[2:6, 2:6] = 1
    small = np.zeros_like(text)
    small[3:5, 3:5] = 1  # area 4
    kernels = np.stack([text, small])
    label = pse_np(kernels, min_area=10)
    assert (label == 0).all()


def test_pa_embedding_gate():
    """Two kernels inside ONE text CC with very different areas trigger the
    embedding gate; pixels are assigned by embedding distance."""
    H, W = 20, 60
    text = np.zeros((H, W), np.uint8)
    text[5:15, 5:55] = 1  # one big text region
    kernel = np.zeros_like(text)
    kernel[9:11, 8:12] = 1     # small kernel left (area 8)
    kernel[6:14, 30:52] = 1    # big kernel right (area 176)
    emb = np.zeros((4, H, W), np.float32)
    emb[0, :, :30] = 1.0  # left half embedding ~ e0
    emb[0, :, 30:] = 5.0  # right half embedding ~ e1
    kernels = np.stack([text, kernel])
    label = pa_np(kernels, emb, min_area=0)
    assert label[10, 9] > 0 and label[10, 40] > 0
    # area ratio 176/8 = 22 < 1024 so gate not triggered -> plain growth;
    # both labels survive and fill their sides
    assert label[10, 9] != label[10, 40]


def test_spread_labels_jax_matches_np():
    rng = np.random.RandomState(0)
    mask = rng.rand(32, 32) > 0.3
    labels = np.zeros((32, 32), np.int32)
    labels[5, 5] = 1
    labels[25, 25] = 2
    mask[5, 5] = mask[25, 25] = True

    out_jax = np.asarray(
        spread_labels_jax(jnp.asarray(labels), jnp.asarray(mask))
    )
    # fixpoint invariants: seeds preserved, labels only within mask,
    # every masked pixel connected to a seed is labeled
    assert out_jax[5, 5] == 1 and out_jax[25, 25] == 2
    assert (out_jax[~mask] == 0).all()
    # re-running changes nothing (fixpoint)
    out2 = np.asarray(spread_labels_jax(jnp.asarray(out_jax), jnp.asarray(mask)))
    np.testing.assert_array_equal(out_jax, out2)


def test_pse_loss_and_postprocess():
    from pytorchocr_tpu.losses import build_loss
    from pytorchocr_tpu.postprocess import build_post_process

    rng = np.random.RandomState(0)
    n, h, w = 2, 32, 32
    preds = {"maps": jnp.asarray(rng.randn(n, h, w, 7).astype(np.float32))}
    batch = (
        None,
        jnp.asarray((rng.rand(n, h * 4, w * 4) > 0.5).astype(np.float32)),
        jnp.asarray((rng.rand(n, 6, h * 4, w * 4) > 0.5).astype(np.float32)),
        jnp.asarray(np.ones((n, h * 4, w * 4), np.float32)),
    )
    loss = build_loss({"name": "PSELoss", "alpha": 0.7, "ohem_ratio": 3,
                       "kernel_sample_mask": "pred", "reduction": "mean"})
    out = loss(preds, batch)
    assert np.isfinite(float(out["loss"]))
    assert 0 <= float(out["iou_text"]) <= 1

    post = build_post_process({"name": "PSEPostProcess", "thresh": 0,
                               "box_thresh": 0.5, "min_area": 4, "scale": 4})
    maps = np.full((1, h, w, 7), -10.0, np.float32)
    maps[0, 8:24, 8:24, :] = 10.0  # confident blob on all kernels
    res = post({"maps": jnp.asarray(maps)}, [[h * 4, w * 4, 1.0, 1.0]])
    assert len(res[0]["points"]) == 1


def test_pan_loss_and_postprocess():
    from pytorchocr_tpu.losses import build_loss
    from pytorchocr_tpu.postprocess import build_post_process

    rng = np.random.RandomState(0)
    n, h, w = 2, 32, 32
    preds = {"maps": jnp.asarray(rng.randn(n, h, w, 6).astype(np.float32))}
    gt_instance = np.zeros((n, h * 4, w * 4), np.int32)
    gt_instance[:, 10:40, 10:60] = 1
    gt_instance[:, 60:90, 10:60] = 2
    batch = (
        None,
        jnp.asarray((gt_instance > 0).astype(np.float32)),
        jnp.asarray((gt_instance > 0).astype(np.float32)),
        jnp.asarray(gt_instance),
        jnp.asarray(np.ones((n, h * 4, w * 4), np.float32)),
    )
    loss = build_loss({"name": "PANLoss", "alpha": 1.0, "beta": 0.5,
                       "gamma": 0.25, "feature_dim": 4, "mode": "v2",
                       "ohem_ratio": 3, "kernel_sample_mask": "pred",
                       "reduction": "mean"})
    out = loss(preds, batch)
    assert np.isfinite(float(out["loss"]))
    assert np.isfinite(float(out["loss_emb"]))

    post = build_post_process({"name": "PANPostProcess", "thresh": 0,
                               "box_thresh": 0.5, "min_area": 4,
                               "min_kernel_area": 2.6, "scale": 4})
    maps = np.full((1, h, w, 6), -10.0, np.float32)
    maps[0, 8:24, 8:24, 0] = 10.0  # text
    maps[0, 10:22, 10:22, 1] = 10.0  # kernel
    res = post({"maps": jnp.asarray(maps)}, [[h * 4, w * 4, 1.0, 1.0]])
    assert len(res[0]["points"]) == 1


def test_pse_expand_device_matches_np():
    from pytorchocr_tpu.ops.cc_label import pse_expand_device

    H = W = 48
    text = np.zeros((H, W), np.uint8)
    text[5:15, 5:43] = 1
    text[30:44, 5:43] = 1
    small = np.zeros_like(text)
    small[8:12, 10:40] = 1
    small[34:40, 10:40] = 1
    kernels = np.stack([text, small])
    want = pse_np(kernels, min_area=0)
    got = np.asarray(pse_expand_device(jnp.asarray(kernels > 0), jnp.float32(0)))
    # same partition up to label ids: compare co-labeling structure
    assert (want > 0).sum() == (got > 0).sum()
    for region in [(slice(5, 15), slice(5, 43)), (slice(30, 44), slice(5, 43))]:
        w_ids = np.unique(want[region]); g_ids = np.unique(got[region])
        assert len(w_ids[w_ids > 0]) == 1 and len(g_ids[g_ids > 0]) == 1
    assert got[10, 20] != got[36, 20]


def test_pse_postprocess_device_matches_host():
    from pytorchocr_tpu.postprocess import build_post_process

    h, w = 32, 32
    maps = np.full((1, h, w, 7), -10.0, np.float32)
    maps[0, 8:24, 4:28, :] = 10.0
    shape_list = [[h * 4, w * 4, 1.0, 1.0]]
    post_dev = build_post_process({"name": "PSEPostProcess", "thresh": 0,
                                   "box_thresh": 0.5, "min_area": 4, "scale": 4,
                                   "use_device_expand": True})
    post_host = build_post_process({"name": "PSEPostProcess", "thresh": 0,
                                    "box_thresh": 0.5, "min_area": 4, "scale": 4,
                                    "use_device_expand": False})
    rd = post_dev({"maps": jnp.asarray(maps)}, shape_list)
    rh = post_host({"maps": jnp.asarray(maps)}, shape_list)
    assert len(rd[0]["points"]) == len(rh[0]["points"]) == 1
    np.testing.assert_allclose(
        np.sort(np.asarray(rd[0]["points"][0]), axis=0),
        np.sort(np.asarray(rh[0]["points"][0]), axis=0),
        atol=2,
    )


def test_pa_device_matches_np():
    from pytorchocr_tpu.ops.cc_label import pa_aggregate_device

    H, W = 24, 64
    text = np.zeros((H, W), np.uint8)
    text[4:20, 4:30] = 1
    text[4:20, 34:60] = 1
    kernel = np.zeros_like(text)
    kernel[8:16, 8:26] = 1
    kernel[8:16, 38:56] = 1
    emb = np.random.RandomState(0).rand(4, H, W).astype(np.float32)
    kernels = np.stack([text, kernel])
    want = pa_np(kernels, emb, min_area=0)
    got = np.asarray(
        pa_aggregate_device(jnp.asarray(kernels > 0), jnp.asarray(emb), jnp.float32(0))
    )
    assert (want > 0).sum() == (got > 0).sum()
    # two instances, each filling its text region
    assert got[10, 10] > 0 and got[10, 40] > 0 and got[10, 10] != got[10, 40]
    assert (got[4:20, 4:30] == got[10, 10]).all()
    assert (got[4:20, 34:60] == got[10, 40]).all()


def test_pan_postprocess_device_matches_host():
    from pytorchocr_tpu.postprocess import build_post_process

    h, w = 32, 32
    maps = np.full((1, h, w, 6), -10.0, np.float32)
    maps[0, 8:24, 4:28, 0] = 10.0
    maps[0, 10:22, 8:24, 1] = 10.0
    shape_list = [[h * 4, w * 4, 1.0, 1.0]]
    kwargs = {"name": "PANPostProcess", "thresh": 0, "box_thresh": 0.5,
              "min_area": 4, "min_kernel_area": 2.6, "scale": 4}
    rd = build_post_process({**kwargs, "use_device_aggregate": True})(
        {"maps": jnp.asarray(maps)}, shape_list)
    rh = build_post_process({**kwargs, "use_device_aggregate": False})(
        {"maps": jnp.asarray(maps)}, shape_list)
    assert len(rd[0]["points"]) == len(rh[0]["points"]) == 1
    np.testing.assert_allclose(
        np.sort(np.asarray(rd[0]["points"][0]), axis=0),
        np.sort(np.asarray(rh[0]["points"][0]), axis=0),
        atol=2,
    )


def test_pan_loss_gradients_finite():
    """The first PAN backward used to NaN: jnp.linalg.norm's gradient is
    0/0 at the structurally-exact zeros of the embedding loss (the i==j
    diagonal of pairwise center distances, empty instance-bucket means),
    and masking the result with jnp.where does not stop the NaN cotangent.
    Regression for the _safe_norm double-where fix in losses/basic.py."""
    import jax
    import jax.numpy as jnp

    from pytorchocr_tpu.losses import build_loss

    rng = np.random.RandomState(0)
    n, h, w = 2, 32, 32
    gt_instance = np.zeros((n, h * 4, w * 4), np.int32)
    gt_instance[:, 10:40, 10:60] = 1
    gt_instance[:, 60:90, 10:60] = 2
    batch = (
        None,
        jnp.asarray((gt_instance > 0).astype(np.float32)),
        jnp.asarray((gt_instance > 0).astype(np.float32)),
        jnp.asarray(gt_instance),
        jnp.asarray(np.ones((n, h * 4, w * 4), np.float32)),
    )
    loss = build_loss({"name": "PANLoss", "alpha": 1.0, "beta": 0.5,
                       "gamma": 0.25, "feature_dim": 4, "mode": "v2",
                       "ohem_ratio": 3, "kernel_sample_mask": "pred",
                       "reduction": "mean"})

    def scalar_loss(maps):
        return loss({"maps": maps}, batch)["loss"]

    maps = jnp.asarray(rng.randn(n, h, w, 6).astype(np.float32))
    g = jax.grad(scalar_loss)(maps)
    assert bool(jnp.all(jnp.isfinite(g))), "PAN loss gradient has NaN/inf"

    # also the v1 mode and the degenerate no-instance sample
    loss_v1 = build_loss({"name": "PANLoss", "alpha": 1.0, "beta": 0.5,
                          "gamma": 0.25, "feature_dim": 4, "mode": "v1",
                          "ohem_ratio": 3, "kernel_sample_mask": "pred",
                          "reduction": "mean"})
    empty = tuple(
        None if b is None else jnp.zeros_like(b) if i >= 3 else b
        for i, b in enumerate(batch)
    )
    g1 = jax.grad(lambda m: loss_v1({"maps": m}, empty)["loss"])(maps)
    assert bool(jnp.all(jnp.isfinite(g1)))


def test_extreme_logit_gradients_finite():
    """Regression for the manual-sigmoid overflow NaN that killed long PAN
    runs: 1/(1+exp(-x)) backward computes (-1/v^2)*(-exp(-x)) = 0*inf = NaN
    once exp(-x) overflows (|x| > ~88.7 in f32 AND bf16).  Dice loss has no
    saturation penalty, so logits legitimately drift past 100 late in
    training (observed absmax 142.9 at NaN onset, epoch ~44 of the synth
    quality run).  All loss sigmoids must use jax.nn.sigmoid, whose custom
    JVP (s*(1-s)) stays finite."""
    import jax
    import jax.numpy as jnp

    from pytorchocr_tpu.losses import build_loss
    from pytorchocr_tpu.losses.basic_loss import DMLLoss

    rng = np.random.RandomState(0)
    n, h, w = 2, 16, 16
    gt_instance = np.zeros((n, h * 4, w * 4), np.int32)
    gt_instance[:, 10:30, 10:50] = 1
    gt_texts = jnp.asarray((gt_instance > 0).astype(np.float32))
    masks = jnp.asarray(np.ones((n, h * 4, w * 4), np.float32))

    for dtype in (jnp.float32, jnp.bfloat16):
        # logits saturated far past the exp-overflow threshold
        base = rng.randn(n, h, w, 7).astype(np.float32) * 150.0

        pan = build_loss({"name": "PANLoss", "mode": "v2"})
        pan_batch = (None, gt_texts, gt_texts, jnp.asarray(gt_instance), masks)
        g = jax.grad(
            lambda m: jnp.float32(pan({"maps": m}, pan_batch)["loss"])
        )(jnp.asarray(base[..., :6], dtype))
        assert bool(jnp.all(jnp.isfinite(jnp.asarray(g, jnp.float32)))), (
            f"PAN grad NaN at extreme logits ({dtype.__name__})"
        )

        pse = build_loss({"name": "PSELoss", "alpha": 0.7})
        gt_kernels = jnp.asarray(
            np.repeat((gt_instance > 0).astype(np.float32)[:, None], 6, axis=1)
        )
        pse_batch = (None, gt_texts, gt_kernels, masks)
        g = jax.grad(
            lambda m: jnp.float32(pse({"maps": m}, pse_batch)["loss"])
        )(jnp.asarray(base, dtype))
        assert bool(jnp.all(jnp.isfinite(jnp.asarray(g, jnp.float32)))), (
            f"PSE grad NaN at extreme logits ({dtype.__name__})"
        )

    # DML det-map branch (sigmoid act) at extreme logits
    dml = DMLLoss(act="sigmoid")
    x = jnp.asarray(rng.randn(2, 8, 8, 1).astype(np.float32) * 150.0)
    y = jnp.asarray(rng.randn(2, 8, 8, 1).astype(np.float32) * 150.0)
    gx = jax.grad(lambda a: dml(a, y))(x)
    assert bool(jnp.all(jnp.isfinite(gx))), "DML grad NaN at extreme logits"


def test_pse_postprocess_device_scale1_readonly_label():
    """scale=1 device path regression: the device label map reaches
    generate_box as a zero-copy READ-ONLY numpy view (no cv2.resize copy at
    scale 1) and the component filter loop writes label[ind] = 0 — this
    crashed the quality PSE training's first eval with 'assignment
    destination is read-only'.  Includes a sub-min_area component so the
    in-place zeroing branch actually runs."""
    from pytorchocr_tpu.postprocess import build_post_process

    h, w = 64, 64
    maps = np.full((1, h, w, 7), -10.0, np.float32)
    maps[0, 8:24, 4:28, :] = 10.0  # real instance
    maps[0, 40, 40, :] = 10.0      # 1px blob -> 16px after x4, < min_area 20
    shape_list = [[h * 4, w * 4, 1.0, 1.0]]
    post = build_post_process({"name": "PSEPostProcess", "thresh": 0,
                               "box_thresh": 0.5, "min_area": 20, "scale": 1,
                               "use_device_expand": True})
    res = post({"maps": jnp.asarray(maps)}, shape_list)
    assert len(res[0]["points"]) == 1


def test_pan_postprocess_device_scale1_readonly_label():
    """Same regression for PAN at scale=1 (its quality config runs scale 4,
    where cv2.resize incidentally made a writable copy)."""
    from pytorchocr_tpu.postprocess import build_post_process

    h, w = 64, 64
    maps = np.full((1, h, w, 6), -10.0, np.float32)
    maps[0, 8:24, 4:28, 0] = 10.0
    maps[0, 10:22, 8:24, 1] = 10.0
    maps[0, 40, 40, 0] = 10.0  # 1px text+kernel blob -> 16px after x4,
    maps[0, 40, 40, 1] = 10.0  # < min_area 20 -> label[ind] = 0 branch
    shape_list = [[h * 4, w * 4, 1.0, 1.0]]
    post = build_post_process({"name": "PANPostProcess", "thresh": 0,
                               "box_thresh": 0.5, "min_area": 20,
                               "min_kernel_area": 2.6, "scale": 1,
                               "use_device_aggregate": True})
    res = post({"maps": jnp.asarray(maps)}, shape_list)
    assert len(res[0]["points"]) == 1
