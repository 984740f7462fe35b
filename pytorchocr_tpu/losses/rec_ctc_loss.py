"""CTC loss (reference pytocr/losses/rec_ctc_loss.py:6-21).

optax.ctc_loss over batch-major (N, T, C) logits; blank id 0; torch
`reduction="mean"` semantics (per-sequence loss divided by label length,
then batch-averaged).
"""

import jax.numpy as jnp
import optax


class CTCLoss:
    def __init__(self, zero_infinity=False, **kwargs):
        self.zero_infinity = zero_infinity

    def __call__(self, predicts, batch):
        if isinstance(predicts, (list, tuple)):
            predicts = predicts[-1]
        logits = predicts.astype(jnp.float32)  # (N, T, C)
        n, t, _ = logits.shape
        labels = batch[1].astype(jnp.int32)  # (N, max_text_len), 0-padded
        label_lengths = batch[2].astype(jnp.int32)  # (N,)

        logit_paddings = jnp.zeros((n, t), dtype=jnp.float32)
        positions = jnp.arange(labels.shape[1])[None, :]
        label_paddings = (positions >= label_lengths[:, None]).astype(jnp.float32)

        per_seq = optax.ctc_loss(
            logits, logit_paddings, labels, label_paddings, blank_id=0
        )
        if self.zero_infinity:
            per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)
        loss = jnp.mean(per_seq / jnp.maximum(label_lengths.astype(jnp.float32), 1.0))
        return {"loss": loss}
