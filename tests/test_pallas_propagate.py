"""Pallas VMEM-resident propagation kernel (interpret mode on CPU):
parity with the XLA fixpoint loop for both update rules."""

import numpy as np

import jax.numpy as jnp

from pytorchocr_tpu.ops.pallas_propagate import (
    pallas_available,
    spread_labels_fixpoint,
)
from pytorchocr_tpu.ops.propagate import spread_labels_jax


def test_budget_gate():
    assert pallas_available((184, 320))  # PSE quarter-res map
    assert pallas_available((640, 640))  # det train-res map
    assert not pallas_available((1472, 2560))  # way over budget


def test_fill_only_matches_xla():
    rng = np.random.RandomState(0)
    mask = rng.rand(64, 64) > 0.3
    labels = np.zeros((64, 64), np.int32)
    labels[5, 5] = 1
    labels[50, 50] = 2
    mask[5, 5] = mask[50, 50] = True
    a = np.asarray(
        spread_labels_fixpoint(jnp.asarray(labels), jnp.asarray(mask), fill_only=True)
    )
    b = np.asarray(
        spread_labels_jax(jnp.asarray(labels), jnp.asarray(mask), fill_only=True)
    )
    np.testing.assert_array_equal(a, b)
    assert (a > 0).sum() > 2


def test_cc_rule_matches_xla():
    rng = np.random.RandomState(1)
    mask = rng.rand(64, 64) > 0.4
    idx = (np.arange(64 * 64, dtype=np.int32) + 1).reshape(64, 64)
    labels = np.where(mask, idx, 0).astype(np.int32)
    a = np.asarray(
        spread_labels_fixpoint(jnp.asarray(labels), jnp.asarray(mask), fill_only=False)
    )
    b = np.asarray(
        spread_labels_jax(jnp.asarray(labels), jnp.asarray(mask), fill_only=False)
    )
    np.testing.assert_array_equal(a, b)


def test_segmented_runmax_pallas_matches_xla_scan():
    """The VMEM segmented run-max kernel (interpret mode on CPU) equals the
    XLA associative-scan version on both axes, including padding bands."""
    import numpy as np
    import jax.numpy as jnp

    from pytorchocr_tpu.ops.cc_label import _segmented_runmax
    from pytorchocr_tpu.ops.pallas_propagate import segmented_runmax_pallas

    rng = np.random.RandomState(3)
    for h, w in [(16, 128), (24, 256), (40, 384)]:
        mask = rng.rand(h, w) > 0.5
        vals = np.where(mask, rng.randint(1, 1 << 20, (h, w)), 0).astype(np.int32)
        for axis in (0, 1):
            got = np.asarray(
                segmented_runmax_pallas(jnp.asarray(vals), jnp.asarray(mask), axis)
            )
            want = np.asarray(
                _segmented_runmax(jnp.asarray(vals), jnp.asarray(mask), axis)
            )
            np.testing.assert_array_equal(got, want, err_msg=f"{h}x{w} axis={axis}")


def test_segmented_runmax_tall_map_falls_back():
    """Maps taller than ~2k rows used to floor the axis=0 column band to 0
    (ZeroDivisionError at trace time, ADVICE r1); now they take the XLA
    associative-scan fallback and still produce the exact per-run max."""
    from pytorchocr_tpu.ops.cc_label import _segmented_runmax
    from pytorchocr_tpu.ops.pallas_propagate import segmented_runmax_pallas

    rng = np.random.RandomState(3)
    h, w = 2304, 256  # band_cap = VMEM/(h*48) < 128 -> fallback path
    vals = jnp.asarray(rng.randint(0, 1 << 20, size=(h, w)), jnp.int32)
    mask = jnp.asarray(rng.rand(h, w) > 0.4)
    got = segmented_runmax_pallas(vals, mask, axis=0)
    want = _segmented_runmax(vals, mask, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
