"""Basic det losses: Balance/Dice/MaskL1/BCE + OHEM + batched IoU + embedding
loss (reference pytocr/losses/det_basic_loss.py).

Pure jnp functions.  OHEM top-k with a data-dependent count is expressed as
sort + rank-mask (static shapes; the standard XLA-friendly formulation of
dynamic top-k).
"""

import jax
import jax.numpy as jnp

EPS = 1e-6


def _safe_norm(x, axis):
    """L2 norm whose gradient is 0 (not NaN) at x == 0.

    d/dx ||x|| = x/||x|| is 0/0 at the origin, and masking the RESULT with
    jnp.where does not stop the NaN cotangent from propagating (the where-
    gradient trap).  The embedding loss hits exact zeros structurally: the
    i==j diagonal of the pairwise center distances, and the all-zero mean
    rows of empty instance buckets.  Double-where keeps the primal exact
    and the cotangent finite."""
    sq = jnp.sum(x * x, axis=axis)
    pos = sq > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)


def bce(pred, gt):
    """Elementwise binary cross entropy on probabilities.

    Probabilities are clamped to [1e-6, 1-1e-6] BEFORE the log so both the
    value and the gradient stay finite when a sigmoid saturates to exactly
    0/1 in float32 (torch's BCE bounds the loss at -log via clamp -100; the
    clamp here additionally zeroes the gradient in the saturated region,
    preventing inf*0 NaNs in the backward pass)."""
    p = jnp.clip(pred, 1e-6, 1.0 - 1e-6)
    return -(gt * jnp.log(p) + (1.0 - gt) * jnp.log1p(-p))


def _kth_largest_threshold(values, k, mask=None, iters=30):
    """Bisection for t with count(valid values > t) <= k <= count(>= t).
    The bisection range covers only VALID values so padding can't destroy
    resolution; 30 halvings reach ~1e-9 of the value range."""
    if mask is None:
        lo = jnp.min(values)
        hi = jnp.max(values)
        valid = None
    else:
        lo = jnp.min(jnp.where(mask, values, jnp.inf))
        hi = jnp.max(jnp.where(mask, values, -jnp.inf))
        # degenerate empty mask: collapse the range (callers guard anyway)
        lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
        hi = jnp.where(jnp.isfinite(hi), hi, 0.0)
        valid = mask

    def count_above(t):
        above = values > t
        if valid is not None:
            above = above & valid
        return jnp.sum(above)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        too_many = count_above(mid) > k
        return jnp.where(too_many, mid, lo), jnp.where(too_many, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return hi


def _topk_sum(values, k):
    """Sum of the k largest entries (k may be a traced float), exact up to
    ties at the threshold value."""
    k = jnp.asarray(k, jnp.float32)
    t = _kth_largest_threshold(values, k)
    above = values > t
    cnt_above = jnp.sum(above)
    sum_above = jnp.sum(jnp.where(above, values, 0.0))
    return sum_above + t * jnp.maximum(k - cnt_above, 0.0)


def balance_loss(
    pred, gt, mask, main_loss_type="BCELoss", negative_ratio=3, balance=True
):
    """OHEM-balanced loss (reference BalanceLoss, det_basic_loss.py:7-92):
    all positives + the top-k hardest negatives, k = ratio * #positives."""
    positive = gt * mask
    negative = (1.0 - gt) * mask

    positive_count = jnp.sum(positive)
    negative_count = jnp.minimum(jnp.sum(negative), positive_count * negative_ratio)

    if main_loss_type == "BCELoss":
        loss = bce(pred, gt)
    elif main_loss_type == "Euclidean":
        loss = (pred - gt) ** 2
    elif main_loss_type == "MaskL1Loss":
        loss = jnp.abs(pred - gt) * mask
    elif main_loss_type == "DiceLoss":
        return dice_loss(pred, gt, mask)
    elif main_loss_type == "CrossEntropy":
        loss = bce(pred, gt)
    else:
        raise ValueError("unsupported main_loss_type %s" % main_loss_type)

    if not balance:
        return loss

    positive_loss = positive * loss
    negative_loss = negative * loss
    # top-k sum with traced k, WITHOUT a full sort (sorting the 16x640x640
    # loss map costs seconds on TPU): bisect the k-th-largest threshold t
    # (each probe is one fused reduction), then
    # topk_sum = sum(v > t) + t * (k - count(v > t))  — exact up to ties.
    selected_neg_sum = _topk_sum(negative_loss.reshape(-1), negative_count)

    balance_val = (jnp.sum(positive_loss) + selected_neg_sum) / (
        positive_count + negative_count + EPS
    )
    no_neg_val = jnp.sum(positive_loss) / (positive_count + EPS)
    return jnp.where(negative_count > 0, balance_val, no_neg_val)


def dice_loss(pred, gt, mask, weights=None):
    """Global dice (reference DiceLoss reduce=True)."""
    if weights is not None:
        mask = weights * mask
    intersection = jnp.sum(pred * gt * mask)
    union = jnp.sum(pred * mask) + jnp.sum(gt * mask) + EPS
    return 1.0 - 2.0 * intersection / union


def dice_loss_per_sample(pred, gt, mask):
    """Per-sample dice (reference DiceLoss reduce=False; PSE/PAN)."""
    b = pred.shape[0]
    pred = pred.reshape(b, -1)
    gt = gt.reshape(b, -1).astype(jnp.float32)
    mask = mask.reshape(b, -1).astype(jnp.float32)
    pred = pred * mask
    gt = gt * mask
    a = jnp.sum(pred * gt, axis=1)
    bb = jnp.sum(pred * pred, axis=1) + EPS
    c = jnp.sum(gt * gt, axis=1) + EPS
    return 1.0 - (2 * a) / (bb + c)


def mask_l1_loss(pred, gt, mask):
    return jnp.sum(jnp.abs(pred - gt) * mask) / (jnp.sum(mask) + EPS)


def iou_binary(a, b, mask, reduce=True):
    """mIoU of binarized maps over {0,1} classes per sample
    (reference IoU, det_basic_loss.py:171-205)."""
    bsz = a.shape[0]
    a = a.reshape(bsz, -1)
    b = b.reshape(bsz, -1)
    mask = (mask.reshape(bsz, -1) == 1).astype(jnp.float32)

    def one_class(i):
        ai = (a == i).astype(jnp.float32) * mask
        bi = (b == i).astype(jnp.float32) * mask
        inter = jnp.sum(ai * bi, axis=1)
        union = jnp.sum(jnp.clip(ai + bi, 0, 1), axis=1)
        return inter / (union + EPS)

    miou = (one_class(0) + one_class(1)) / 2.0
    return jnp.mean(miou) if reduce else miou


def ohem_batch(scores, gt_texts, training_masks, ohem_ratio=3):
    """Per-image OHEM mask selection (reference OHEM_BATCH,
    det_basic_loss.py:208-260), vectorized over the batch with sort +
    rank-threshold instead of data-dependent indexing."""

    def ohem_single(score, gt_text, training_mask):
        pos = (gt_text > 0.5).astype(jnp.float32)
        pos_valid = pos * (training_mask > 0.5).astype(jnp.float32)
        pos_num = jnp.sum(pos_valid)

        neg = (gt_text <= 0.5).astype(jnp.float32)
        neg_num = jnp.minimum(jnp.sum(neg), pos_num * ohem_ratio)

        # score of the k-th hardest negative via bisection (full sorts are
        # seconds-slow on TPU at map sizes)
        threshold = _kth_largest_threshold(
            score.reshape(-1), neg_num, mask=gt_text.reshape(-1) <= 0.5
        )

        selected = jnp.logical_and(
            jnp.logical_or(score >= threshold, gt_text > 0.5),
            training_mask > 0.5,
        ).astype(jnp.float32)
        # no positives or no negatives -> fall back to the training mask
        fallback = jnp.logical_or(pos_num == 0, neg_num == 0)
        return jnp.where(fallback, training_mask.astype(jnp.float32), selected)

    return jax.vmap(ohem_single)(scores, gt_texts, training_masks)


def emb_loss_single(emb, instance, kernel, training_mask, max_instances=64,
                    feature_dim=4, delta_v=0.5, delta_d=1.5, mode="v2",
                    bg_sample=100):
    """Discriminative embedding loss for one sample (reference EmbLoss,
    det_basic_loss.py:263-366).

    TPU-native formulation: instances are bucketed into a fixed
    `max_instances` table (instance id clamp), per-instance means via
    segment-sum, pairwise center distances masked by validity — no
    data-dependent shapes.
    emb: (D, H*W); instance/kernel/training_mask: (H*W,).
    """
    training_mask = (training_mask > 0.5).astype(jnp.int32)
    kernel = (kernel > 0.5).astype(jnp.int32)
    instance = instance * training_mask
    instance = jnp.clip(instance, 0, max_instances - 1)
    instance_kernel = instance * kernel

    # per-instance kernel-region means (cluster centers)
    counts_k = jax.ops.segment_sum(
        jnp.ones_like(instance_kernel, dtype=jnp.float32),
        instance_kernel,
        num_segments=max_instances,
    )
    sums_k = jax.ops.segment_sum(emb.T, instance_kernel, num_segments=max_instances)
    valid = counts_k > 0  # (I,)
    emb_mean = sums_k / jnp.maximum(counts_k, 1.0)[:, None]  # (I, D)

    num_instance = jnp.sum(valid.astype(jnp.int32))  # includes background 0

    # l_agg: pull pixels towards their instance center
    centers_per_pixel = emb_mean[instance]  # (HW, D)
    dist = _safe_norm(emb.T - centers_per_pixel, axis=1)
    hinge = jnp.log(jax.nn.relu(dist - delta_v) ** 2 + 1.0)
    sums_h = jax.ops.segment_sum(hinge, instance, num_segments=max_instances)
    counts_i = jax.ops.segment_sum(
        jnp.ones_like(instance, dtype=jnp.float32), instance, num_segments=max_instances
    )
    mean_h = sums_h / jnp.maximum(counts_i, 1.0)
    fg_valid = valid.at[0].set(False)
    n_fg = jnp.sum(fg_valid.astype(jnp.float32))
    l_agg = jnp.sum(jnp.where(fg_valid, mean_h, 0.0)) / jnp.maximum(n_fg, 1.0)

    # l_dis: push cluster centers apart (and, in v2, away from background)
    diff = emb_mean[:, None, :] - emb_mean[None, :, :]
    cdist = _safe_norm(diff, axis=-1)
    pair_valid = (
        fg_valid[:, None]
        & fg_valid[None, :]
        & ~jnp.eye(max_instances, dtype=bool)
    )
    push = jnp.log(jax.nn.relu(2 * delta_d - cdist) ** 2 + 1.0)
    n_pairs = jnp.sum(pair_valid.astype(jnp.float32))
    if mode == "v1":
        l_dis = jnp.sum(jnp.where(pair_valid, push, 0.0)) / jnp.maximum(n_pairs, 1.0)
    else:
        terms_sum = jnp.sum(jnp.where(pair_valid, push, 0.0))
        terms_cnt = n_pairs
        # background push: sample up to bg_sample background pixels
        is_bg = (instance == 0).astype(jnp.float32)
        n_bg = jnp.sum(is_bg)
        # deterministic "sample": weight background pixels by bg_sample/n_bg
        bg_dist = _safe_norm(
            emb.T[None, :, :] - emb_mean[:, None, :], axis=-1
        )  # (I, HW)
        bg_push = jnp.log(jax.nn.relu(2 * delta_d - bg_dist) ** 2 + 1.0)
        bg_mean_per_inst = jnp.sum(bg_push * is_bg[None, :], axis=1) / jnp.maximum(
            n_bg, 1.0
        )
        terms_sum = terms_sum + jnp.sum(jnp.where(fg_valid, bg_mean_per_inst, 0.0))
        terms_cnt = terms_cnt + n_fg * jnp.minimum(n_bg, 1.0)
        l_dis = terms_sum / jnp.maximum(terms_cnt, 1.0)
    l_dis = jnp.where(num_instance > 2, l_dis, 0.0)

    l_reg = (
        jnp.sum(
            jnp.where(valid, jnp.log(_safe_norm(emb_mean, axis=1) + 1.0), 0.0)
        )
        / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        * 0.001
    )
    loss = l_agg + l_dis + l_reg
    return jnp.where(num_instance > 1, loss, 0.0)


def emb_loss(emb, instance, kernel, training_mask, mode="v2", feature_dim=4):
    """Batched embedding loss; emb (N, H, W, D) NHWC, others (N, H, W)."""
    n = emb.shape[0]
    emb_flat = emb.reshape(n, -1, emb.shape[-1]).transpose(0, 2, 1)  # (N, D, HW)
    inst_flat = instance.reshape(n, -1).astype(jnp.int32)
    kern_flat = kernel.reshape(n, -1).astype(jnp.int32)
    mask_flat = training_mask.reshape(n, -1)
    fn = lambda e, i, k, m: emb_loss_single(
        e, i, k, m, feature_dim=feature_dim, mode=mode
    )
    return jnp.mean(jax.vmap(fn)(emb_flat, inst_flat, kern_flat, mask_flat))
