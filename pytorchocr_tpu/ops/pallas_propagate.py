"""Pallas TPU kernel: VMEM-resident label propagation.

The XLA fixpoint loop in ops/propagate.py / ops/cc_label.py pays one HBM
round trip per 4-neighbor spreading round.  This kernel keeps the label map
in VMEM and runs ROUNDS_PER_CALL rounds per HBM pass (a 736x1280 int32 map
is ~3.8 MB — comfortably VMEM-resident), and also emits a `changed` flag so
the outer lax.while_loop can stop at the fixpoint.

Used by connected-component labeling (DB postprocess front-half) and the
PSE/PAN expansion when maps fit in VMEM; callers fall back to the plain XLA
loop otherwise.
"""

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

ROUNDS_PER_CALL = 16
_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom below the ~16MB/core VMEM


def pallas_available(shape):
    if not _HAVE_PALLAS:
        return False
    h, w = shape
    # Mosaic holds ~6 live full-size int32 buffers for the roll/max chain
    # (measured: 21.7MB scoped at 736x1280); PSE/PAN quarter-res maps and
    # <=640px DB maps fit, larger maps take the XLA fallback
    return (h * w * 4) * 6 < _VMEM_BUDGET


def _propagate_kernel(labels_ref, mask_ref, out_ref, changed_ref, *, fill_only):
    h, w = labels_ref.shape
    # boundary-invalidation masks as broadcastable (h,1)/(1,w) vectors —
    # full (h,w) iotas would blow the VMEM budget at 736x1280
    row = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    not_top = row > 0
    not_bottom = row < h - 1
    not_left = col > 0
    not_right = col < w - 1
    # int8 in VMEM (4x smaller than int32); Mosaic can't compare int8
    # directly — widen before the compare (transient)
    mask = mask_ref[:].astype(jnp.int32) > 0

    def one_round(_, carry):
        labels, _ = carry
        best = labels
        # pltpu.roll requires non-negative shifts: -1 == size-1 (cyclic)
        up = jnp.where(not_top, pltpu.roll(labels, 1, 0), 0)
        best = jnp.maximum(best, up)
        down = jnp.where(not_bottom, pltpu.roll(labels, h - 1, 0), 0)
        best = jnp.maximum(best, down)
        left = jnp.where(not_left, pltpu.roll(labels, 1, 1), 0)
        best = jnp.maximum(best, left)
        right = jnp.where(not_right, pltpu.roll(labels, w - 1, 1), 0)
        best = jnp.maximum(best, right)
        if fill_only:
            # PSE/PAN expansion: only unlabeled masked pixels take a label
            new = jnp.where((labels == 0) & mask, best, labels)
        else:
            # CC labeling: every masked pixel takes the neighborhood max
            new = jnp.where(mask, best, 0)
        # "changed in the LAST round" decides whether the fixpoint is hit —
        # avoids retaining a full start-copy for the comparison
        changed = jnp.any(new != labels).astype(jnp.int32)
        return new, changed

    final, changed = jax.lax.fori_loop(
        0, ROUNDS_PER_CALL, one_round, (labels_ref[:], jnp.int32(1))
    )
    out_ref[:] = final
    changed_ref[0] = changed


def _interpret_mode():
    # compiled Mosaic kernels need a real TPU; CPU tests run interpreted
    return jax.default_backend() != "tpu"


def propagate_rounds_pallas(labels, mask, fill_only=True):
    """Run ROUNDS_PER_CALL spreading rounds in one VMEM-resident kernel.
    Returns (new_labels, changed_bool)."""
    h, w = labels.shape
    out, changed = pl.pallas_call(
        functools.partial(_propagate_kernel, fill_only=fill_only),
        interpret=_interpret_mode(),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )(labels.astype(jnp.int32), mask.astype(jnp.int8))
    return out, changed[0] > 0


def _band_rows(h, w):
    """Largest row-band (multiple of 8 sublanes) fitting the VMEM budget."""
    max_rows = _VMEM_BUDGET // (w * 4 * 6)
    return max(8, (max_rows // 8) * 8)


@functools.partial(jax.jit, static_argnames=("fill_only",))
def _spread_fixpoint_tiled(labels, mask, fill_only=True):
    """Row-band-tiled Pallas fixpoint for maps over the single-call VMEM
    budget: each outer round sweeps the bands (1-row halo on each side, 16
    VMEM-resident propagation rounds per band) until nothing changes.
    Components crossing band boundaries converge over a few outer sweeps."""
    h, w = labels.shape
    band = _band_rows(h, w)
    n_bands = -(-h // band)
    pad_h = n_bands * band
    labels = jnp.pad(labels, ((0, pad_h - h), (0, 0)))
    mask = jnp.pad(mask, ((0, pad_h - h), (0, 0)))

    def sweep(state):
        lbl, _ = state
        changed = jnp.bool_(False)
        for b in range(n_bands):
            start = max(b * band - 1, 0)
            stop = min((b + 1) * band + 1, pad_h)
            rows = stop - start
            seg = jax.lax.dynamic_slice(lbl, (start, 0), (rows, w))
            mseg = jax.lax.dynamic_slice(mask, (start, 0), (rows, w))
            new_seg, ch = propagate_rounds_pallas(seg, mseg, fill_only)
            lbl = jax.lax.dynamic_update_slice(lbl, new_seg, (start, 0))
            changed = changed | ch
        return lbl, changed

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, sweep, sweep((labels, jnp.bool_(True))))
    return labels[:h]


@functools.partial(jax.jit, static_argnames=("fill_only",))
def spread_labels_fixpoint(labels, mask, fill_only=True):
    """Fixpoint spreading: Pallas inner kernel (16 rounds per HBM pass)
    when the map fits the VMEM budget, row-band-tiled Pallas above it, and
    the plain XLA loop when Pallas is unavailable.

    fill_only=True: unlabeled masked pixels take neighbor labels (PSE/PAN
    expansion).  fill_only=False: all masked pixels take the neighborhood
    max each round (connected-component labeling)."""
    if not pallas_available(labels.shape):
        if _HAVE_PALLAS and labels.shape[1] * 4 * 6 * 16 < _VMEM_BUDGET:
            return _spread_fixpoint_tiled(labels, mask, fill_only=fill_only)
        from .propagate import spread_labels_jax

        return spread_labels_jax(labels, mask, fill_only=fill_only)

    def cond(state):
        return state[1]

    def body(state):
        lbl, _ = state
        return propagate_rounds_pallas(lbl, mask, fill_only)

    labels, changed = propagate_rounds_pallas(
        labels.astype(jnp.int32), mask, fill_only
    )
    labels, _ = jax.lax.while_loop(cond, body, (labels, changed))
    return labels


# ---------------------------------------------------------------------------
# Segmented run-max scan kernel (CC-labeling spreading)
# ---------------------------------------------------------------------------
#
# spread_labels_scan (ops/cc_label.py) propagates labels with alternating
# row/column segmented run-max passes.  The XLA associative_scan lowering
# pays an HBM round trip per log-step (~22 full-map passes per alternation);
# this kernel runs the whole log-step Hillis-Steele segmented scan in VMEM —
# one HBM read + write per pass.  Bands tile the NON-scan axis, so each
# band's scan axis is complete and no halo is needed.


def _runmax_kernel(vals_ref, mask_ref, out_ref, *, axis):
    v = vals_ref[:]
    m = mask_ref[:].astype(jnp.int32) > 0
    v = jnp.where(m, v, 0)
    n = v.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)

    def scan(direction):
        # direction +1: forward (combine with element i-s);
        # direction -1: backward (combine with element i+s).
        # flags stay int32: Mosaic has no i1 vector rotate
        sv = v
        sf = (~m).astype(jnp.int32)
        s = 1
        while s < n:
            shift = s if direction > 0 else n - s  # pltpu.roll is cyclic
            rv = pltpu.roll(sv, shift, axis)
            rf = pltpu.roll(sf, shift, axis)
            valid = (idx >= s) if direction > 0 else (idx < n - s)
            rv = jnp.where(valid, rv, 0)
            rf = jnp.where(valid, rf, 1)  # out of range == boundary
            sv = jnp.where(sf > 0, sv, jnp.maximum(sv, rv))
            sf = jnp.maximum(sf, rf)
            s *= 2
        return sv

    out = jnp.maximum(scan(+1), scan(-1))
    out_ref[:] = jnp.where(m, out, 0)


def _runmax_band(vals, mask, axis, band, n_bands):
    h, w = vals.shape
    if axis == 1:  # row scan: bands of rows
        block = (band, w)
        index_map = lambda i: (i, 0)
    else:  # column scan: strips of columns
        block = (h, band)
        index_map = lambda i: (0, i)
    return pl.pallas_call(
        functools.partial(_runmax_kernel, axis=axis),
        interpret=_interpret_mode(),
        grid=(n_bands,),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        in_specs=[
            pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM),
    )(vals, mask)


def _pad_to(x, mult, axis):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0), (0, 0)]
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def segmented_runmax_pallas(vals, mask, axis):
    """Per-run max along `axis` (run = maximal contiguous masked stretch),
    full log-step scan in VMEM, band-tiled along the other axis."""
    h, w = vals.shape
    mask = mask.astype(jnp.int8)
    # ~12 live (band x scan-extent) int32 buffers across the two scan
    # directions' shift/where chains (measured: 6 hit Mosaic's scoped-vmem
    # limit at 408x1280)
    other = w if axis == 1 else h
    band_cap = _VMEM_BUDGET // (other * 4 * 12)
    # Minimum TPU tile: 8 rows (axis=1 bands) / 128 columns (axis=0 bands).
    # When even one minimum-width band blows the VMEM budget (very large
    # `other` extent, e.g. maps taller than ~2k rows for axis=0), fall back
    # to the XLA associative-scan path instead of flooring the band to 0
    # (which used to ZeroDivisionError in _pad_to at trace time).
    min_band = 8 if axis == 1 else 128
    if band_cap < min_band:
        from .cc_label import _segmented_runmax

        return _segmented_runmax(vals, mask.astype(bool), axis)
    if axis == 1:
        band = min((band_cap // 8) * 8, ((h + 7) // 8) * 8)
        vp = _pad_to(vals, band, 0)
        mp = _pad_to(mask, band, 0)
        out = _runmax_band(vp, mp, 1, band, vp.shape[0] // band)
        return out[:h]
    band = min((band_cap // 128) * 128, ((w + 127) // 128) * 128)
    vp = _pad_to(vals, band, 1)
    mp = _pad_to(mask, band, 1)
    out = _runmax_band(vp, mp, 0, band, vp.shape[1] // band)
    return out[:, :w]
