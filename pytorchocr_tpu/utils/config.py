"""Config / flag system.

YAML-semantics-compatible rebuild of the reference config layer
(`tools/program.py:19-100` in DYJNG/PyTorchOCR): a single YAML file with
sections ``Global / Architecture / Loss / Optimizer / PostProcess / Metric /
Train / Eval`` plus ``-o Key.Sub=value`` dotted CLI overrides whose values are
YAML-parsed.  Supports the ``!!python/tuple`` tag used by the reference
configs without resorting to unsafe loading.
"""

import argparse
import copy
import os

import yaml


class _ConfigLoader(yaml.SafeLoader):
    """SafeLoader that also understands !!python/tuple (used by reference
    configs, e.g. configs/det/det_r18_db.yml:50)."""


_ConfigLoader.add_constructor(
    "tag:yaml.org,2002:python/tuple",
    lambda loader, node: tuple(loader.construct_sequence(node)),
)


class AttrDict(dict):
    """dict with attribute access, applied recursively on load."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key, value):
        self[key] = value

    def __deepcopy__(self, memo):
        return AttrDict(
            {copy.deepcopy(k, memo): copy.deepcopy(v, memo) for k, v in self.items()}
        )


def _to_attrdict(obj):
    if isinstance(obj, dict):
        return AttrDict({k: _to_attrdict(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_to_attrdict(v) for v in obj]
    return obj


def load_config(file_path):
    """Load a YAML config file into a nested AttrDict."""
    _, ext = os.path.splitext(file_path)
    assert ext in [".yml", ".yaml"], "only support yaml files for now"
    with open(file_path, "rb") as f:
        config = yaml.load(f, Loader=_ConfigLoader)
    return _to_attrdict(config)


def parse_value(v):
    """YAML-parse a single CLI override value (so '3', 'true', '[1,2]' become
    typed values, mirroring the reference ArgsParser._parse_opt)."""
    return yaml.load(v, Loader=_ConfigLoader)


def merge_config(config, opts):
    """Merge dotted-key overrides into config in place.

    ``opts`` is a dict like {"Global.epoch_num": 10, "Optimizer.base_lr": 1e-3}.
    Keys without a dot replace/merge whole top-level sections.
    """
    for key, value in opts.items():
        if "." not in key:
            if isinstance(value, dict) and key in config:
                config[key].update(_to_attrdict(value))
            else:
                config[key] = _to_attrdict(value)
        else:
            sub_keys = key.split(".")
            assert sub_keys[0] in config, (
                "the sub_keys can only be one of global_config: {}, but get: "
                "{}, please check your running command".format(
                    config.keys(), sub_keys[0]
                )
            )
            cur = config[sub_keys[0]]
            for idx, sub_key in enumerate(sub_keys[1:-1], start=1):
                if sub_key not in cur or not isinstance(cur[sub_key], dict):
                    cur[sub_key] = AttrDict()
                cur = cur[sub_key]
            cur[sub_keys[-1]] = _to_attrdict(value)
    return config


class ArgsParser(argparse.ArgumentParser):
    """`-c config.yml -o Key.Sub=val` CLI, compatible with the reference."""

    def __init__(self, **kwargs):
        super().__init__(
            formatter_class=argparse.RawDescriptionHelpFormatter, **kwargs
        )
        self.add_argument("-c", "--config", help="configuration file to use")
        self.add_argument(
            "-o", "--opt", nargs="+", help="set configuration options"
        )
        # accepted for launcher compatibility (the reference is launched via
        # torch.distributed.launch which injects it — reference
        # tools/program.py:26); on TPU the process/device topology comes
        # from jax.distributed, so the value is ignored.
        self.add_argument(
            "--local_rank",
            type=int,
            default=0,
            help="ignored; accepted for torch.distributed.launch compatibility",
        )

    def parse_args(self, argv=None):
        args = super().parse_args(argv)
        assert args.config is not None, "Please specify --config=configure_file_path."
        args.opt = self._parse_opt(args.opt)
        return args

    def _parse_opt(self, opts):
        config = {}
        if not opts:
            return config
        for s in opts:
            s = s.strip()
            k, v = s.split("=", 1)
            config[k] = parse_value(v)
        return config


def save_config(config, path):
    """Dump the resolved config to the run directory (tools/program.py:483)."""
    dirname = os.path.dirname(path)
    if dirname:
        os.makedirs(dirname, exist_ok=True)

    def plain(obj):
        if isinstance(obj, dict):
            return {k: plain(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return [plain(v) for v in obj]
        return obj

    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(plain(config), f, default_flow_style=False, sort_keys=False)
