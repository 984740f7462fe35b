"""Registry helpers: instantiate flax modules from config dicts, keeping the
reference's support_dict-whitelist behavior while filtering config keys that
are not module fields (e.g. torch-only `pretrained` / `ckpt_path`)."""

import dataclasses

from pytorchocr_tpu.utils.logging import get_logger

_IGNORED_KEYS = {"pretrained", "ckpt_path"}


def instantiate(module_class, config, **extra):
    field_names = {f.name for f in dataclasses.fields(module_class)}
    kwargs = {}
    dropped = []
    for k, v in config.items():
        if k in field_names:
            kwargs[k] = v
        elif k not in _IGNORED_KEYS:
            dropped.append(k)
    if dropped:
        get_logger().warning(
            "%s: ignoring config keys %s", module_class.__name__, dropped
        )
    kwargs.update(extra)
    return module_class(**kwargs)
