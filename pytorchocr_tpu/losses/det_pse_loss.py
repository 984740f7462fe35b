"""PSE loss (reference pytocr/losses/det_pse_loss.py:8-72).

Preds are NHWC logits at 1/4 resolution, upsampled x4 (nearest) before the
loss; dice losses apply sigmoid (act=True in the reference).  Sigmoids use
jax.nn.sigmoid, whose custom JVP stays finite when exp(-x) would overflow
(manual 1/(1+exp(-x)) yields 0*inf=NaN gradients past |x|~88.7).
"""

import jax
import jax.numpy as jnp

from ..modeling.common import resize_nearest
from . import basic


class PSELoss:
    def __init__(
        self,
        alpha=0.7,
        ohem_ratio=3,
        kernel_sample_mask="pred",
        reduction="mean",
        **kwargs
    ):
        assert reduction in ["sum", "mean", "none"]
        self.alpha = alpha
        self.ohem_ratio = ohem_ratio
        self.kernel_sample_mask = kernel_sample_mask
        self.reduction = reduction

    def __call__(self, outputs, labels):
        predicts = resize_nearest(outputs["maps"], 4)  # (N, H, W, 7)
        texts = predicts[..., 0]
        kernels = predicts[..., 1:]
        gt_texts, gt_kernels, training_masks = labels[1:4]
        # gt_kernels comes in as (N, K-1, H, W) from the GT maker
        gt_kernels = jnp.asarray(gt_kernels)

        selected_masks = basic.ohem_batch(
            texts, gt_texts, training_masks, self.ohem_ratio
        )
        loss_text = basic.dice_loss_per_sample(
            jax.nn.sigmoid(texts), gt_texts, selected_masks
        )
        iou_text = basic.iou_binary(
            (texts > 0).astype(jnp.int32), gt_texts, training_masks, reduce=False
        )
        losses = {"loss_text": loss_text, "iou_text": iou_text}

        if self.kernel_sample_mask == "gt":
            kernel_masks = gt_texts * training_masks
        else:  # "pred"
            kernel_masks = (jax.nn.sigmoid(texts) > 0.5).astype(jnp.float32) * training_masks

        loss_kernel_list = []
        num_k = kernels.shape[-1]
        for i in range(num_k):
            kernel_i = jax.nn.sigmoid(kernels[..., i])
            gt_kernel_i = gt_kernels[:, i]
            loss_kernel_list.append(
                basic.dice_loss_per_sample(kernel_i, gt_kernel_i, kernel_masks)
            )
        loss_kernels = jnp.mean(jnp.stack(loss_kernel_list, axis=1), axis=1)
        iou_kernel = basic.iou_binary(
            (kernels[..., -1] > 0).astype(jnp.int32),
            gt_kernels[:, -1],
            training_masks * gt_texts,
            reduce=False,
        )
        losses.update({"loss_kernels": loss_kernels, "iou_kernel": iou_kernel})

        loss = self.alpha * loss_text + (1 - self.alpha) * loss_kernels
        losses["loss"] = loss
        if self.reduction == "sum":
            losses = {k: jnp.sum(v) for k, v in losses.items()}
        elif self.reduction == "mean":
            losses = {k: jnp.mean(v) for k, v in losses.items()}
        return losses
