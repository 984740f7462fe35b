"""On-device CC labeling + DB device postprocess path: parity with the host
path on synthetic maps."""

import numpy as np

import jax.numpy as jnp

from pytorchocr_tpu.ops.cc_label import connected_components, db_front_half
from pytorchocr_tpu.postprocess.db_postprocess import DBPostProcess


def test_connected_components_basic():
    binary = np.zeros((32, 32), bool)
    binary[2:8, 2:8] = True
    binary[20:28, 20:28] = True
    binary[15, 15] = True  # single pixel
    labels, num = connected_components(jnp.asarray(binary))
    labels = np.asarray(labels)
    assert int(num) == 3
    a, b, c = labels[4, 4], labels[24, 24], labels[15, 15]
    assert len({a, b, c}) == 3 and min(a, b, c) > 0
    assert (labels[2:8, 2:8] == a).all()
    assert (labels[~binary] == 0).all()


def test_db_front_half_stats():
    prob = np.zeros((64, 64), np.float32)
    prob[10:20, 10:40] = 0.9
    prob[40:50, 10:30] = 0.6
    stats = db_front_half(jnp.asarray(prob), 0.3, max_labels=16)
    count = np.asarray(stats["count"])
    score = np.asarray(stats["score"])
    bbox = np.asarray(stats["bbox"])
    live = [i for i in range(1, 16) if count[i] > 0]
    assert len(live) == 2
    sizes = sorted((int(count[i]), round(float(score[i]), 4)) for i in live)
    assert sizes == [(200, 0.6), (300, 0.9)]
    for i in live:
        x0, y0, x1, y1 = bbox[i]
        assert x1 > x0 and y1 > y0


def test_db_device_path_matches_host():
    rng = np.random.RandomState(0)
    prob = np.zeros((1, 160, 160, 1), np.float32)
    prob[0, 60:100, 40:120, 0] = 0.9
    prob[0, 10:30, 10:60, 0] = 0.7
    shape_list = [[160, 160, 1.0, 1.0]]

    post = DBPostProcess(thresh=0.3, box_thresh=0.5, unclip_ratio=1.5,
                         score_mode="poly")
    host_res = post({"maps": prob}, shape_list)  # numpy -> host path
    dev_res = post({"maps": jnp.asarray(prob)}, shape_list)  # jax -> device path

    hb = sorted(np.asarray(b).mean(axis=0).tolist() for b in host_res[0]["points"])
    db = sorted(np.asarray(b).mean(axis=0).tolist() for b in dev_res[0]["points"])
    assert len(hb) == len(db) == 2
    for h, d in zip(hb, db):
        np.testing.assert_allclose(h, d, atol=2.0)
    np.testing.assert_allclose(
        sorted(host_res[0]["scores"]), sorted(dev_res[0]["scores"]), atol=0.02
    )


def test_scan_spreading_matches_neighbor_propagation():
    """The segmented-scan CC spreading reaches the same fixpoint as the
    per-round neighbor propagation on awkward shapes (U, spiral, diagonal
    staircases, random blobs)."""
    import numpy as np

    from pytorchocr_tpu.ops.cc_label import spread_labels_scan
    from pytorchocr_tpu.ops.pallas_propagate import spread_labels_fixpoint

    rng = np.random.RandomState(7)
    cases = []
    # U shape
    u = np.zeros((24, 24), bool)
    u[4:20, 4:7] = True
    u[4:20, 17:20] = True
    u[17:20, 4:20] = True
    cases.append(u)
    # inward rectangular spiral
    s = np.zeros((31, 31), bool)
    top, left, bottom, right = 0, 0, 30, 30
    while top < bottom:
        s[top, left : right + 1] = True
        s[top : bottom + 1, right] = True
        s[bottom, left : right + 1] = True
        s[top + 2 : bottom + 1, left] = True
        top += 4
        left += 4
        bottom -= 4
        right -= 4
    cases.append(s)
    # random blobs
    for _ in range(3):
        cases.append(rng.rand(40, 52) > 0.6)

    for binary in cases:
        h, w = binary.shape
        seed = np.where(binary, np.arange(h * w).reshape(h, w) + 1, 0).astype(
            np.int32
        )
        got = np.asarray(spread_labels_scan(jnp.asarray(seed), jnp.asarray(binary)))
        want = np.asarray(
            spread_labels_fixpoint(jnp.asarray(seed), jnp.asarray(binary), fill_only=False)
        )
        np.testing.assert_array_equal(got, want)
