"""SLANet table loss (reference pytocr/losses/table_att_loss.py:7-60):
structure CE over shifted targets + masked MSE/smooth-L1 bbox loss."""

import jax
import jax.numpy as jnp
import optax


class SLALoss:
    def __init__(self, structure_weight, loc_weight, loc_loss_type="mse",
                 label_smoothing=0.0, **kwargs):
        assert loc_loss_type in ["mse", "smooth_l1"]
        self.structure_weight = structure_weight
        self.loc_weight = loc_weight
        self.loc_loss_type = loc_loss_type
        # optional smoothing on the structure CE (0 = reference parity);
        # over 40-60-token sequences the all-or-nothing exact-match metric
        # compounds per-token overconfidence — smoothing regularizes it
        self.label_smoothing = float(label_smoothing)
        self.eps = 1e-12

    def __call__(self, predicts, batch):
        structure_probs = predicts["structure_probs"].astype(jnp.float32)  # (N, T, C) logits
        structure_targets = batch[1].astype(jnp.int32)[:, 1:]
        logits = structure_probs.reshape(-1, structure_probs.shape[-1])
        labels = structure_targets.reshape(-1)
        if self.label_smoothing > 0.0:
            n_cls = logits.shape[-1]
            smooth = optax.smooth_labels(
                jax.nn.one_hot(labels, n_cls), self.label_smoothing
            )
            ce = optax.softmax_cross_entropy(logits, smooth)
        else:
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        structure_loss = jnp.mean(ce)
        structure_loss = structure_loss * self.structure_weight

        loc_preds = predicts["loc_preds"].astype(jnp.float32)
        loc_targets = batch[2].astype(jnp.float32)[:, 1:, :]
        loc_targets_mask = batch[3].astype(jnp.float32)[:, 1:, :]

        diff = loc_preds * loc_targets_mask - loc_targets * loc_targets_mask
        if self.loc_loss_type == "smooth_l1":
            ad = jnp.abs(diff)
            loc_loss = jnp.sum(jnp.where(ad < 1.0, 0.5 * diff ** 2, ad - 0.5))
        else:
            loc_loss = jnp.sum(diff ** 2)
        loc_loss = loc_loss * self.loc_weight / (jnp.sum(loc_targets_mask) + self.eps)

        total_loss = structure_loss + loc_loss
        return {
            "loss": total_loss,
            "structure_loss": structure_loss,
            "loc_loss": loc_loss,
        }
