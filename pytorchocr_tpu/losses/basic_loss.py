"""KL/JS divergence, deep-mutual-learning and distance losses
(reference pytocr/losses/basic_loss.py:9-86)."""

import jax
import jax.numpy as jnp


class KLJSLoss:
    def __init__(self, mode="kl", reduction="mean", **kwargs):
        assert mode.lower() in ["kl", "js"]
        assert reduction in ["sum", "mean", "none"]
        self.mode = mode.lower()
        self.reduction = reduction

    def __call__(self, p1, p2):
        loss = p2 * jnp.log((p2 + 1e-5) / (p1 + 1e-5) + 1e-5)
        if self.mode == "js":
            loss = loss + p1 * jnp.log((p1 + 1e-5) / (p2 + 1e-5) + 1e-5)
            loss = loss * 0.5
        if self.reduction == "sum":
            return jnp.sum(loss)
        if self.reduction == "mean":
            return jnp.mean(loss)
        return loss


class DMLLoss:
    """Deep mutual learning: JS for det maps; symmetric batchmean-KL over
    log-probs for rec logits (use_log=True)."""

    def __init__(self, act=None, use_log=False, **kwargs):
        assert act in [None, "softmax", "sigmoid"]
        self.act = act
        self.use_log = use_log
        self.jskl_loss = KLJSLoss(mode="js")

    def __call__(self, out1, out2):
        out1 = jnp.asarray(out1, dtype=jnp.float32)
        out2 = jnp.asarray(out2, dtype=jnp.float32)
        if self.act == "softmax":
            out1 = jnp.exp(out1 - jnp.max(out1, -1, keepdims=True))
            out1 = out1 / jnp.sum(out1, -1, keepdims=True)
            out2 = jnp.exp(out2 - jnp.max(out2, -1, keepdims=True))
            out2 = out2 / jnp.sum(out2, -1, keepdims=True)
        elif self.act == "sigmoid":
            out1 = jax.nn.sigmoid(out1)
            out2 = jax.nn.sigmoid(out2)
        if self.use_log:
            # torch kl_div(log_p, q, 'batchmean') = sum(q*(log q - log_p))/N
            batch = out1.shape[0]
            log1 = jnp.log(out1 + 1e-10)
            log2 = jnp.log(out2 + 1e-10)
            kl12 = jnp.sum(out2 * (log2 - log1)) / batch
            kl21 = jnp.sum(out1 * (log1 - log2)) / batch
            return (kl12 + kl21) / 2.0
        return self.jskl_loss(out1, out2)


class DistanceLoss:
    def __init__(self, mode="l2", **kwargs):
        assert mode in ["l1", "l2", "smooth_l1"]
        self.mode = mode

    def __call__(self, x, y):
        x = jnp.asarray(x, dtype=jnp.float32)
        y = jnp.asarray(y, dtype=jnp.float32)
        d = x - y
        if self.mode == "l1":
            return jnp.mean(jnp.abs(d))
        if self.mode == "l2":
            return jnp.mean(d ** 2)
        ad = jnp.abs(d)
        return jnp.mean(jnp.where(ad < 1.0, 0.5 * d ** 2, ad - 0.5))
