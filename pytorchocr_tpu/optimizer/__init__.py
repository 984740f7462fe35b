"""Optimizer factory (reference pytocr/optimizer/__init__.py:8-39).

Maps the reference's torch.optim names to optax transformations; LR
schedules are step->lr callables injected via optax.inject_hyperparams so
the current LR is visible in the optimizer state for logging.
"""

import copy

import optax

from .lr_scheduler import WarmupCosineLR, WarmupMultiStepLR, WarmupPolyLR

__all__ = ["build_optimizer"]

_SCHEDULES = {
    "WarmupMultiStepLR": WarmupMultiStepLR,
    "WarmupPolyLR": WarmupPolyLR,
    "WarmupCosineLR": WarmupCosineLR,
}


def _make_optim(name, lr, cfg):
    """torch.optim.<name> equivalents. lr may be a schedule callable."""
    betas = cfg.get("betas", (0.9, 0.999))
    weight_decay = cfg.get("weight_decay", 0.0)
    eps = cfg.get("eps", 1e-8)
    if name == "Adam":
        if cfg.get("amsgrad", False):
            core = optax.amsgrad(lr, b1=betas[0], b2=betas[1], eps=eps)
        else:
            core = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
        if weight_decay:
            # torch Adam weight_decay is L2 added to the gradient
            return optax.chain(optax.add_decayed_weights(weight_decay), core)
        return core
    if name == "AdamW":
        return optax.adamw(
            lr, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay if weight_decay else 1e-2,
        )
    if name == "SGD":
        momentum = cfg.get("momentum", 0.0)
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(
            optax.sgd(lr, momentum=momentum or None, nesterov=cfg.get("nesterov", False))
        )
        return optax.chain(*chain)
    if name == "RMSprop":
        return optax.rmsprop(
            lr,
            decay=cfg.get("alpha", 0.99),
            eps=cfg.get("eps", 1e-8),
            momentum=cfg.get("momentum", 0.0),
        )
    raise ValueError("unsupported optimizer %s" % name)


def build_optimizer(config, epochs, step_each_epoch, parameters=None):
    """Returns (optax transformation, lr_schedule callable)."""
    config = copy.deepcopy(config)
    base_lr = config.pop("base_lr")
    optim_cfg = dict(config["optim"])
    optim_name = optim_cfg.pop("name")

    lr_schedule = None
    if "lr_decay" in config and "name" in config["lr_decay"]:
        lr_cfg = dict(config["lr_decay"])
        lr_decay_name = lr_cfg.pop("name")
        assert lr_decay_name in _SCHEDULES, Exception(
            "lr scheduler only support {}".format(list(_SCHEDULES))
        )
        warmup_epoch = lr_cfg.pop("warmup_epoch", 0)
        warmup_iters = warmup_epoch * step_each_epoch
        max_iters = epochs * step_each_epoch
        if "T_max_epoch" in lr_cfg:
            T_max_iters = lr_cfg.pop("T_max_epoch") * step_each_epoch
        else:
            T_max_iters = 50 * step_each_epoch
        lr_schedule = _SCHEDULES[lr_decay_name](
            base_lr,
            warmup_iters=warmup_iters,
            max_iters=max_iters,
            T_max_iters=T_max_iters,
            **lr_cfg
        )
        lr = lr_schedule
    else:
        lr = base_lr
        lr_schedule = lambda step: base_lr

    tx = _make_optim(optim_name, lr, optim_cfg)
    return tx, lr_schedule
