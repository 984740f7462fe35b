"""On-device connected-component labeling + per-label reductions.

The TPU-native replacement for the host front-half of DB postprocess
(reference: .cpu().numpy() + cv2.findContours + per-contour fillPoly mean
scoring, db_postprocess.py:43-72 and the C++ module).  Pipeline, all inside
one jit:

  prob map -> threshold -> CC labels (alternating segmented run-max scans;
  see spread_labels_scan) -> sort-free compact relabel (representative-rank
  cumsum) -> per-label count/prob-sum via a fused one-hot MXU matmul and
  bbox via one packed segment_min.

Only (labels int32, per-label stats) cross to host; the box-score is exact
("poly" score = mean prob over the component).  Host work shrinks to
minAreaRect + unclip on the <=max_labels surviving components.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _segmented_runmax(vals, mask, axis):
    """Per-run max along `axis`: every pixel of a maximal contiguous masked
    run gets the run's max; unmasked pixels become 0.  One forward + one
    backward log-depth associative scan."""
    vals = jnp.where(mask, vals, 0)
    boundary = ~mask  # combine resets at unmasked pixels

    def combine(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, jnp.maximum(av, bv)), af | bf

    fwd, _ = jax.lax.associative_scan(combine, (vals, boundary), axis=axis)
    bwd, _ = jax.lax.associative_scan(
        combine, (vals, boundary), axis=axis, reverse=True
    )
    return jnp.where(mask, jnp.maximum(fwd, bwd), 0)


def spread_labels_scan(labels, mask):
    """Spread labels to the per-component max via alternating row/column
    segmented run-max scans.

    Per-pixel neighbor propagation (Pallas/XLA roll-max) needs O(component
    diameter) rounds — ~100ms for page-size maps.  A segmented scan moves a
    label across an ENTIRE run in one log-depth pass, so convergence takes
    O(staircase complexity of the component shape) alternations (2 for
    rectangles, a handful for L/U/spiral shapes) — measured ~25x faster on
    realistic 736x1280 detection maps.  Exact: same fixpoint (the unique
    per-component max) as the neighbor-propagation kernel.
    """
    mask = mask.astype(bool)

    # on TPU the whole log-step scan runs in VMEM (one HBM pass per axis —
    # ops/pallas_propagate.py:segmented_runmax_pallas); elsewhere the XLA
    # associative_scan fallback, parity-tested against it
    if jax.default_backend() == "tpu":
        from .pallas_propagate import segmented_runmax_pallas as runmax
    else:
        runmax = _segmented_runmax

    def body(state):
        lbl, _ = state
        l1 = runmax(lbl, mask, axis=1)
        l2 = runmax(l1, mask, axis=0)
        return l2, jnp.any(l2 != lbl)

    def cond(state):
        return state[1]

    out, _ = jax.lax.while_loop(
        cond, lambda s: body((s[0], False)), body((labels, True))
    )
    return out


def connected_components(binary, max_labels=1024):
    """4-connected components of a (H, W) bool map.

    Returns (labels, num) where labels is int32 (H, W) with values in
    [0, max_labels), 0 = background, and components are compactly numbered
    starting at 1 in raster-scan order of their seed pixel.
    """
    h, w = binary.shape
    idx = (jnp.arange(h * w, dtype=jnp.int32) + 1).reshape(h, w)
    labels = jnp.where(binary, idx, 0)

    # fixpoint spreading via alternating segmented scans (diameter-free;
    # see spread_labels_scan) — the per-round Pallas kernel remains for the
    # BFS-order-sensitive PSE/PAN expansion paths
    labels = spread_labels_scan(labels, binary)

    # compact relabel, sort-free: a pixel i is its component's
    # REPRESENTATIVE iff its final label equals its own seed index i+1 (the
    # component max is itself a pixel position).  The compact id of a
    # component is the rank of its representative — one cumsum + one gather
    # instead of jnp.unique's full device sort (which dominated the front-
    # half cost: ~100ms for a 736x1280 map).
    flat = labels.reshape(-1)
    present = flat == (jnp.arange(h * w, dtype=jnp.int32) + 1)
    ranks = jnp.cumsum(present.astype(jnp.int32))
    compact = jnp.where(flat > 0, ranks[jnp.maximum(flat - 1, 0)], 0)
    # overflow components clamp into the last slot (same as before)
    compact = jnp.clip(compact, 0, max_labels - 1).reshape(h, w)
    num = jnp.minimum(ranks[-1], max_labels - 1)
    return compact.astype(jnp.int32), num


@partial(jax.jit, static_argnames=("max_labels",))
def pse_expand_device(kernels, min_area, max_labels=1024):
    """On-device progressive scale expansion (pse.pyx semantics):
    kernels (K, H, W) bool ordered big..small.  CC on the smallest kernel,
    min-area filter via segment counts, then per-level fixpoint spreading
    (Pallas VMEM kernel at these quarter-res map sizes).  Returns the int32
    label map."""
    from .pallas_propagate import spread_labels_fixpoint

    labels, num = connected_components(kernels[-1], max_labels)
    counts = jax.ops.segment_sum(
        jnp.ones_like(labels.reshape(-1), dtype=jnp.float32),
        labels.reshape(-1),
        num_segments=max_labels,
    )
    keep = counts >= min_area
    keep = keep.at[0].set(False)
    labels = jnp.where(keep[labels], labels, 0)

    for k in range(kernels.shape[0] - 2, -1, -1):
        labels = spread_labels_fixpoint(labels, kernels[k], fill_only=True)
    return labels


@partial(jax.jit, static_argnames=("max_labels",))
def pa_aggregate_device(kernels, emb, min_area, max_labels=256, emb_thresh=3.0):
    """On-device pixel aggregation (pa.pyx semantics):

    kernels (2, H, W) bool = [text, kernel]; emb (D, H, W).
    CC on kernel -> min-area filter -> pairwise extreme-area-ratio flags
    within the same text CC (segment reductions + one (L, L) table) ->
    gated fill spreading into the text region: a pixel may take a
    neighboring label only if the label is unflagged or its embedding is
    within `emb_thresh` of the label's kernel-mean embedding.
    """
    text_mask = kernels[0]
    labels, _ = connected_components(kernels[1], max_labels)
    h, w = labels.shape
    flat = labels.reshape(-1)

    counts = jax.ops.segment_sum(
        jnp.ones_like(flat, dtype=jnp.float32), flat, num_segments=max_labels
    )
    valid = (counts >= min_area).at[0].set(False)
    labels = jnp.where(valid[labels], labels, 0)
    flat = labels.reshape(-1)

    # text-CC id of each label (labels live inside text components)
    cc_text, _ = connected_components(text_mask, max_labels * 4)
    text_of = jax.ops.segment_max(
        cc_text.reshape(-1), flat, num_segments=max_labels
    )

    # mean kernel embedding per label
    emb_flat = emb.reshape(emb.shape[0], -1)  # (D, HW)
    sums = jax.ops.segment_sum(emb_flat.T, flat, num_segments=max_labels)
    mean_emb = sums / jnp.maximum(counts, 1.0)[:, None]  # (L, D)

    # extreme area-ratio pairs within one text CC set the embedding gate
    max_rate = 1024.0
    rate = counts[:, None] / jnp.maximum(counts[None, :], 1.0)
    extreme = (rate > max_rate) | (rate < 1.0 / max_rate)
    same_cc = text_of[:, None] == text_of[None, :]
    pair = (
        valid[:, None]
        & valid[None, :]
        & same_cc
        & extreme
        & ~jnp.eye(max_labels, dtype=bool)
    )
    flag = jnp.any(pair, axis=1)

    # gated fill spreading
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    emb_hw = jnp.moveaxis(emb, 0, -1)  # (H, W, D)

    def one_round(state):
        lbl, _ = state
        best = jnp.zeros_like(lbl)
        for dx, dy, vmask in (
            (1, 0, row > 0),
            (-1, 0, row < h - 1),
            (0, 1, col > 0),
            (0, -1, col < w - 1),
        ):
            nb = jnp.where(vmask, jnp.roll(lbl, (dx, dy), axis=(0, 1)), 0)
            dist = jnp.linalg.norm(emb_hw - mean_emb[nb], axis=-1)
            ok = (nb > 0) & (~flag[nb] | (dist <= emb_thresh))
            best = jnp.maximum(best, jnp.where(ok, nb, 0))
        new = jnp.where((lbl == 0) & text_mask, best, lbl)
        return new, jnp.any(new != lbl)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(
        cond, lambda s: one_round((s[0], False)), one_round((labels, True))
    )
    return labels


@partial(jax.jit, static_argnames=("max_labels",))
def db_front_half(prob, thresh=0.3, max_labels=1024):
    """Device front-half of DBPostProcess for one (H, W) prob map.

    Returns dict of:
      labels  (H, W) int32 compact component ids (0 = background)
      count   (max_labels,) pixels per component
      score   (max_labels,) mean prob per component (the reference's
              "poly" score mode — mean over the region)
      bbox    (max_labels, 4) xmin, ymin, xmax, ymax
    """
    binary = prob > thresh
    labels, num = connected_components(binary, max_labels)
    flat = labels.reshape(-1)

    # per-label count/prob-sum as one-hot matmuls — ~7x faster than two
    # segment_sum scatters on v5e (2.3 vs 17 ms for a 736x1280 map), with
    # HIGHEST precision keeping f32-exact sums.  The label axis is chunked
    # (256-label tiles scanned sequentially) because XLA does not fuse the
    # elementwise one-hot into the dot operand: a full (H*W, max_labels)
    # bf16 one-hot would be a ~1.9 GB HBM transient for a 736x1280 map at
    # max_labels=1024; the chunked transient is bounded at ~480 MB.
    vals = jnp.stack(
        [jnp.ones_like(flat, jnp.float32), prob.reshape(-1).astype(jnp.float32)]
    )  # (2, n)
    chunk = min(max_labels, 256)
    n_chunks = -(-max_labels // chunk)

    def chunk_sums(c, _):
        ids = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        onehot = (flat[:, None] == ids[None, :]).astype(jnp.bfloat16)
        s = jnp.dot(vals, onehot, precision=jax.lax.Precision.HIGHEST)
        return c + 1, s  # (2, chunk)

    _, sums = jax.lax.scan(chunk_sums, 0, None, length=n_chunks)
    sums = jnp.moveaxis(sums, 0, 1).reshape(2, n_chunks * chunk)[:, :max_labels]
    count = sums[0]
    score = sums[1] / jnp.maximum(count, 1.0)

    h, w = prob.shape
    ys = jnp.repeat(jnp.arange(h, dtype=jnp.int32), w)
    xs = jnp.tile(jnp.arange(w, dtype=jnp.int32), h)
    big = jnp.int32(1 << 30)
    # all four extremes in ONE vectorized segment_min (min of -x == -max x):
    # ~3.8x faster than four separate scatters
    stacked = jnp.stack([xs, ys, -xs, -ys], axis=1)
    stacked = jnp.where((flat > 0)[:, None], stacked, big)
    mins = jax.ops.segment_min(stacked, flat, num_segments=max_labels)
    xmin, ymin = mins[:, 0], mins[:, 1]
    xmax, ymax = -mins[:, 2], -mins[:, 3]
    bbox = jnp.stack([xmin, ymin, xmax, ymax], axis=1)
    return {
        # int16 halves the device->host transfer (components <= max_labels)
        "labels": labels.astype(jnp.int16),
        "num": num,
        "count": count,
        "score": score,
        "bbox": bbox,
    }
