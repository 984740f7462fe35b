"""PAN/PAN++ loss (reference pytocr/losses/det_pan_loss.py:8-80):
alpha*text + beta*kernel + gamma*emb (1.0/0.5/0.25)."""

import jax
import jax.numpy as jnp

from ..modeling.common import resize_nearest
from . import basic


def _sigmoid(x):
    # jax.nn.sigmoid, NOT 1/(1+exp(-x)): the manual form's backward computes
    # (-1/v^2) * (-exp(-x)) which is 0*inf = NaN once exp(-x) overflows
    # (|x| > ~88.7 in f32/bf16).  Dice loss drives logits past that range
    # late in training; jax.nn.sigmoid's custom JVP (s*(1-s)) stays finite.
    return jax.nn.sigmoid(x)


class PANLoss:
    def __init__(
        self,
        alpha=1.0,
        beta=0.5,
        gamma=0.25,
        feature_dim=4,
        mode="v2",
        ohem_ratio=3,
        kernel_sample_mask="pred",
        reduction="mean",
        **kwargs
    ):
        assert reduction in ["sum", "mean", "none"]
        assert mode in ["v1", "v2"]
        self.alpha = alpha
        self.beta = beta
        self.gamma = gamma
        self.feature_dim = feature_dim
        self.mode = mode
        self.ohem_ratio = ohem_ratio
        self.kernel_sample_mask = kernel_sample_mask
        self.reduction = reduction

    def __call__(self, outputs, labels):
        predicts = resize_nearest(outputs["maps"], 4)  # (N, H, W, 6)
        texts = predicts[..., 0]
        kernels = predicts[..., 1]
        embs = predicts[..., 2:]  # (N, H, W, 4)
        gt_texts, gt_kernels, gt_instance, training_masks = labels[1:5]

        selected_masks = basic.ohem_batch(
            texts, gt_texts, training_masks, self.ohem_ratio
        )
        loss_text = basic.dice_loss_per_sample(_sigmoid(texts), gt_texts, selected_masks)
        iou_text = basic.iou_binary(
            (texts > 0).astype(jnp.int32), gt_texts, training_masks, reduce=False
        )
        losses = {"loss_text": loss_text, "iou_text": iou_text}

        if self.kernel_sample_mask == "gt":
            kernel_masks = gt_texts * training_masks
        else:
            kernel_masks = (_sigmoid(texts) > 0.5).astype(jnp.float32) * training_masks
        loss_kernels = basic.dice_loss_per_sample(
            _sigmoid(kernels), gt_kernels, kernel_masks
        )
        iou_kernel = basic.iou_binary(
            (kernels > 0).astype(jnp.int32),
            gt_kernels,
            training_masks * gt_texts,
            reduce=False,
        )
        losses.update({"loss_kernels": loss_kernels, "iou_kernel": iou_kernel})

        loss_emb = basic.emb_loss(
            embs, gt_instance, gt_kernels, training_masks,
            mode=self.mode, feature_dim=self.feature_dim,
        )
        losses["loss_emb"] = loss_emb

        loss = self.alpha * loss_text + self.beta * loss_kernels + self.gamma * loss_emb
        losses["loss"] = loss
        if self.reduction == "sum":
            losses = {k: jnp.sum(v) for k, v in losses.items()}
        elif self.reduction == "mean":
            losses = {k: jnp.mean(v) for k, v in losses.items()}
        return losses
