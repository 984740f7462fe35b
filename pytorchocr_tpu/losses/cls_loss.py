"""Direction-classification loss (reference pytocr/losses/cls_loss.py:4-12)."""

import jax.numpy as jnp
import optax


class ClsLoss:
    def __init__(self, **kwargs):
        pass

    def __call__(self, predicts, batch):
        label = batch[1].astype(jnp.int32)
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                predicts.astype(jnp.float32), label
            )
        )
        return {"loss": loss}
