"""On-device connected-component labeling + per-label reductions.

The TPU-native replacement for the host front-half of DB postprocess
(reference: .cpu().numpy() + cv2.findContours + per-contour fillPoly mean
scoring, db_postprocess.py:43-72 and the C++ module).  Pipeline, all inside
one jit:

  prob map -> threshold -> CC labels (fixpoint 4-neighbor max propagation,
  a lax.while_loop of VPU shifts) -> compact relabel (sized jnp.unique) ->
  per-label pixel count / prob sum / bbox via segment reductions.

Only (labels int32, per-label stats) cross to host; the box-score is exact
("poly" score = mean prob over the component).  Host work shrinks to
minAreaRect + unclip on the <=max_labels surviving components.
"""

from functools import partial

import jax
import jax.numpy as jnp


def connected_components(binary, max_labels=1024):
    """4-connected components of a (H, W) bool map.

    Returns (labels, num) where labels is int32 (H, W) with values in
    [0, max_labels), 0 = background, and components are compactly numbered
    starting at 1 in raster-scan order of their seed pixel.
    """
    h, w = binary.shape
    idx = (jnp.arange(h * w, dtype=jnp.int32) + 1).reshape(h, w)
    labels = jnp.where(binary, idx, 0)

    # fixpoint 4-neighbor max spreading: Pallas VMEM kernel (tiled over row
    # bands for big maps), XLA roll/max fallback (ops/pallas_propagate.py)
    from .pallas_propagate import spread_labels_fixpoint

    labels = spread_labels_fixpoint(labels, binary, fill_only=False)

    # compact relabel: sized unique + searchsorted (jit-compatible).
    # Pad with int32 max so the padded array stays sorted.
    sentinel = jnp.iinfo(jnp.int32).max
    uniq = jnp.unique(labels, size=max_labels, fill_value=sentinel)
    compact = jnp.searchsorted(uniq, labels)
    # background label 0 maps to position of 0 in uniq (position 0 whenever
    # any background exists); overflow components clamp into the last slot
    compact = jnp.clip(compact, 0, max_labels - 1)
    num = jnp.sum((uniq > 0) & (uniq < sentinel))
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

    ones = jnp.ones_like(flat, dtype=jnp.float32)
    count = jax.ops.segment_sum(ones, flat, num_segments=max_labels)
    score_sum = jax.ops.segment_sum(
        prob.reshape(-1).astype(jnp.float32), flat, num_segments=max_labels
    )
    score = score_sum / jnp.maximum(count, 1.0)

    h, w = prob.shape
    ys = jnp.repeat(jnp.arange(h, dtype=jnp.int32), w)
    xs = jnp.tile(jnp.arange(w, dtype=jnp.int32), h)
    big = jnp.int32(1 << 30)
    xmin = jax.ops.segment_min(
        jnp.where(flat > 0, xs, big), flat, num_segments=max_labels
    )
    ymin = jax.ops.segment_min(
        jnp.where(flat > 0, ys, big), flat, num_segments=max_labels
    )
    xmax = jax.ops.segment_max(
        jnp.where(flat > 0, xs, -1), flat, num_segments=max_labels
    )
    ymax = jax.ops.segment_max(
        jnp.where(flat > 0, ys, -1), flat, num_segments=max_labels
    )
    bbox = jnp.stack([xmin, ymin, xmax, ymax], axis=1)
    return {
        # int16 halves the device->host transfer (components <= max_labels)
        "labels": labels.astype(jnp.int16),
        "num": num,
        "count": count,
        "score": score,
        "bbox": bbox,
    }
