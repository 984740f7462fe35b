"""DB loss (reference pytocr/losses/det_db_loss.py:6-54):
alpha*Balance(shrink) + beta*MaskL1(thresh) + Dice(binary).

Preds are NHWC maps (N, H, W, 3): [shrink, threshold, binary].
Batch contract (labels[1:]): threshold_map, threshold_mask, shrink_map,
shrink_mask — identical to the reference KeepKeys order.
"""

from . import basic


class DBLoss:
    def __init__(
        self,
        balance_loss=True,
        main_loss_type="BCELoss",
        alpha=1,
        beta=10,
        ohem_ratio=3,
        eps=1e-6,
        **kwargs
    ):
        self.alpha = alpha
        self.beta = beta
        self.balance = balance_loss
        self.main_loss_type = main_loss_type
        self.ohem_ratio = ohem_ratio

    def __call__(self, predicts, labels):
        predict_maps = predicts["maps"]
        label_threshold_map, label_threshold_mask, label_shrink_map, label_shrink_mask = labels[1:5]
        shrink_maps = predict_maps[..., 0]
        threshold_maps = predict_maps[..., 1]
        binary_maps = predict_maps[..., 2]

        loss_shrink = basic.balance_loss(
            shrink_maps,
            label_shrink_map,
            label_shrink_mask,
            main_loss_type=self.main_loss_type,
            negative_ratio=self.ohem_ratio,
            balance=self.balance,
        )
        loss_threshold = basic.mask_l1_loss(
            threshold_maps, label_threshold_map, label_threshold_mask
        )
        loss_binary = basic.dice_loss(binary_maps, label_shrink_map, label_shrink_mask)

        loss_shrink = self.alpha * loss_shrink
        loss_threshold = self.beta * loss_threshold
        loss_all = loss_shrink + loss_threshold + loss_binary
        return {
            "loss": loss_all,
            "loss_shrink_maps": loss_shrink,
            "loss_threshold_maps": loss_threshold,
            "loss_binary_maps": loss_binary,
        }
