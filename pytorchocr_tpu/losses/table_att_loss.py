"""SLANet table loss (reference pytocr/losses/table_att_loss.py:7-60):
structure CE over shifted targets + masked MSE/smooth-L1 bbox loss."""

import jax
import jax.numpy as jnp
import optax


class SLALoss:
    def __init__(self, structure_weight, loc_weight, loc_loss_type="mse",
                 label_smoothing=0.0, aux_count_weight=0.0, **kwargs):
        assert loc_loss_type in ["mse", "smooth_l1"]
        self.structure_weight = structure_weight
        self.loc_weight = loc_weight
        self.loc_loss_type = loc_loss_type
        # optional smoothing on the structure CE (0 = reference parity);
        # over 40-60-token sequences the all-or-nothing exact-match metric
        # compounds per-token overconfidence — smoothing regularizes it
        self.label_smoothing = float(label_smoothing)
        # CE weight on the SLAHead aux_count row/col-count branch
        # (predicts["row_logits"/"col_logits"] vs batch[4]/batch[5] —
        # TableLabelEncode's row_cnt/col_cnt, which the config must list
        # in Train keep_keys between bbox_masks and shape)
        self.aux_count_weight = float(aux_count_weight)
        self.eps = 1e-12

    def __call__(self, predicts, batch):
        structure_probs = predicts["structure_probs"].astype(jnp.float32)  # (N, T, C) logits
        structure_targets = batch[1].astype(jnp.int32)[:, 1:]
        # align decode steps with encoded target length: when a config
        # overrides Global.max_text_length but leaves the Head's YAML
        # anchor (or vice versa) the head scan runs min(steps, targets)
        # steps — slice both sides to the common length instead of
        # letting the CE broadcast fail with an opaque shape error
        t = min(structure_probs.shape[1], structure_targets.shape[1])
        structure_probs = structure_probs[:, :t]
        structure_targets = structure_targets[:, :t]
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

        loc_preds = predicts["loc_preds"].astype(jnp.float32)[:, :t]
        loc_targets = batch[2].astype(jnp.float32)[:, 1:, :][:, :t]
        loc_targets_mask = batch[3].astype(jnp.float32)[:, 1:, :][:, :t]

        diff = loc_preds * loc_targets_mask - loc_targets * loc_targets_mask
        if self.loc_loss_type == "smooth_l1":
            ad = jnp.abs(diff)
            loc_loss = jnp.sum(jnp.where(ad < 1.0, 0.5 * diff ** 2, ad - 0.5))
        else:
            loc_loss = jnp.sum(diff ** 2)
        loc_loss = loc_loss * self.loc_weight / (jnp.sum(loc_targets_mask) + self.eps)

        total_loss = structure_loss + loc_loss
        out = {
            "loss": total_loss,
            "structure_loss": structure_loss,
            "loc_loss": loc_loss,
        }
        if self.aux_count_weight > 0.0 and "row_logits" in predicts:
            row_ce = optax.softmax_cross_entropy_with_integer_labels(
                predicts["row_logits"].astype(jnp.float32),
                batch[4].astype(jnp.int32),
            )
            col_ce = optax.softmax_cross_entropy_with_integer_labels(
                predicts["col_logits"].astype(jnp.float32),
                batch[5].astype(jnp.int32),
            )
            count_loss = self.aux_count_weight * jnp.mean(row_ce + col_ce)
            out["count_loss"] = count_loss
            out["loss"] = total_loss + count_loss
        return out
