"""Label propagation (progressive scale expansion / pixel aggregation).

TPU-native replacement for the reference's Cython BFS kernels
(pse_postprocess_fast/pse.pyx, pan_postprocess_fast/pa.pyx): BFS growth of
instance labels is a fixed-point of synchronous 4-neighbor label spreading
restricted to a mask — i.e. repeated masked max-pool — which maps directly
onto the TPU VPU.  Both a jax on-device version (jitted lax.while_loop) and
a vectorized numpy host fallback are provided; they produce identical
results up to BFS tie-break order on instance-boundary pixels (the Cython
version's own tie-breaking is queue-order dependent).

NOTE: the reference pse.pyx iterates kernel_idx from kernel_num-1 down to 0
over an array holding kernel_num-1 kernels with boundscheck disabled — an
out-of-bounds first round.  We implement the intended PSENet semantics:
expand through kernels[kernel_num-2] ... kernels[0].
"""

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


# ---------------------------------------------------------------------------
# numpy host implementation
# ---------------------------------------------------------------------------


def _spread_once_np(labels, mask, emb=None, mean_emb=None, gate=None, emb_thresh=3.0):
    """One synchronous round: unlabeled masked pixels take a neighbor label."""
    h, w = labels.shape
    changed = False
    for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nb = np.zeros_like(labels)
        if dx == -1:
            nb[:-1] = labels[1:]
        elif dx == 1:
            nb[1:] = labels[:-1]
        elif dy == -1:
            nb[:, :-1] = labels[:, 1:]
        else:
            nb[:, 1:] = labels[:, :-1]
        cand = (labels == 0) & mask & (nb > 0)
        if emb is not None and gate is not None:
            idx = np.where(cand)
            if idx[0].size:
                lbl = nb[idx]
                gated = gate[lbl]
                if gated.any():
                    d = np.linalg.norm(
                        emb[:, idx[0], idx[1]].T - mean_emb[lbl], axis=1
                    )
                    keep = ~gated | (d <= emb_thresh)
                    cand_idx = (idx[0][keep], idx[1][keep])
                    if cand_idx[0].size:
                        labels[cand_idx] = nb[cand_idx]
                        changed = True
                    continue
            if idx[0].size:
                labels[idx] = nb[idx]
                changed = True
            continue
        if cand.any():
            labels[cand] = nb[cand]
            changed = True
    return changed


def _propagate_np(labels, mask, emb=None, mean_emb=None, gate=None, emb_thresh=3.0):
    """Spread labels to a fixpoint within mask."""
    for _ in range(max(labels.shape) * 2):
        if not _spread_once_np(labels, mask, emb, mean_emb, gate, emb_thresh):
            break
    return labels


def pse_np(kernels, min_area):
    """Progressive scale expansion (pse.pyx semantics).

    kernels: (K, H, W) uint8, ordered big..small (kernels[0]=text-size).
    Returns int32 label map at full input resolution.
    """
    kernel_num = kernels.shape[0]
    label_num, label = cv2.connectedComponents(kernels[-1], connectivity=4)
    label = label.astype(np.int32)

    if min_area > 0:
        counts = np.bincount(label.ravel(), minlength=label_num)
        small = np.where(counts < min_area)[0]
        if small.size:
            wipe = np.isin(label, small[small > 0])
            label[wipe] = 0

    for kernel_idx in range(kernel_num - 2, -1, -1):
        _propagate_np(label, kernels[kernel_idx] > 0)
    return label


def pa_np(kernels, emb, min_area=0):
    """Pixel aggregation (pa.pyx semantics).

    kernels: (2, H, W) uint8 = [text, kernel]; emb: (4, H, W) float32.
    Labels grow from kernel CCs into the text region; labels flagged by the
    extreme-area-ratio test additionally require ||emb - mean_emb|| <= 3.
    """
    _, cc = cv2.connectedComponents(kernels[0], connectivity=4)
    label_num, label = cv2.connectedComponents(kernels[1], connectivity=4)
    label = label.astype(np.int32)

    mean_emb = np.zeros((label_num, emb.shape[0]), dtype=np.float32)
    area = np.full((label_num,), -1, dtype=np.float32)
    flag = np.zeros((label_num,), dtype=bool)
    rep = np.zeros((label_num, 2), dtype=np.int64)

    max_rate = 1024.0
    for i in range(1, label_num):
        ind = label == i
        area[i] = ind.sum()
        if area[i] < min_area:
            label[ind] = 0
            continue
        px, py = np.where(ind)
        rep[i] = (px[0], py[0])
        for j in range(1, i):
            if area[j] < min_area:
                continue
            if cc[rep[i, 0], rep[i, 1]] != cc[rep[j, 0], rep[j, 1]]:
                continue
            rate = area[i] / area[j]
            if rate < 1 / max_rate or rate > max_rate:
                flag[i] = True
                mean_emb[i] = emb[:, label == i].mean(axis=1)
                if not flag[j]:
                    flag[j] = True
                    mean_emb[j] = emb[:, label == j].mean(axis=1)

    _propagate_np(label, kernels[0] > 0, emb=emb, mean_emb=mean_emb, gate=flag)
    return label


# ---------------------------------------------------------------------------
# jax on-device implementation
# ---------------------------------------------------------------------------


def _jax_modules():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def spread_labels_jax(labels, mask, max_iters=256, fill_only=True):
    """On-device fixpoint label spreading: labels (H, W) int32, mask (H, W)
    bool.  Each round is four shifted selects — pure VPU work under jit.
    fill_only=True fills unlabeled pixels only (PSE/PAN expansion);
    fill_only=False takes the neighborhood max everywhere (CC labeling)."""
    jax, jnp = _jax_modules()

    def shift(x, dx, dy):
        return jnp.roll(x, (dx, dy), axis=(0, 1))

    h, w = labels.shape
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]

    def one_round(state):
        labels, _ = state
        best = labels
        for dx, dy, valid in (
            (1, 0, row > 0),
            (-1, 0, row < h - 1),
            (0, 1, col > 0),
            (0, -1, col < w - 1),
        ):
            nb = jnp.where(valid, shift(labels, dx, dy), 0)
            best = jnp.maximum(best, nb)
        if fill_only:
            new_labels = jnp.where((labels == 0) & mask, best, labels)
        else:
            new_labels = jnp.where(mask, best, 0)
        return new_labels, jnp.any(new_labels != labels)

    def cond(state):
        return state[1]

    def body(state):
        return one_round((state[0], False))

    labels, changed = one_round((labels, True))
    labels, _ = jax.lax.while_loop(cond, body, (labels, changed))
    return labels
