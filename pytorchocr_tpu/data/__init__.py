"""Data layer: build_dataloader (reference pytocr/data/__init__.py:11-57).

TPU divergences: the loader is a torch-free thread-pool loader
(pytorchocr_tpu/data/loader.py); per-host sharding replaces
DistributedSampler and is applied automatically on multi-process JAX.
"""

import copy

from .imaug import transform, create_operators  # noqa: F401
from .loader import OCRDataLoader, default_collate  # noqa: F401
from .pubtab_dataset import PubTabDataSet
from .simple_dataset import SimpleDataSet

__all__ = ["build_dataloader", "transform", "create_operators", "OCRDataLoader"]


def _process_info():
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def build_dataloader(config, mode, logger, seed=None):
    config = copy.deepcopy(config)
    if seed is None:
        # Every process MUST agree on the dataset order or the per-host
        # shards (order[shard::num_shards]) overlap/miss samples — the same
        # contract DistributedSampler has in the reference
        # (pytocr/data/__init__.py:42-47, epoch-seeded common permutation).
        # An unseeded RNG draws different orders per process, so default to
        # the run seed instead of entropy.
        seed = config["Global"].get("seed", 2022)

    support_dict = ["SimpleDataSet", "PubTabDataSet"]
    module_name = config[mode]["dataset"]["name"]
    assert module_name in support_dict, Exception(
        "DataSet only support {}".format(support_dict)
    )
    assert mode in ["Train", "Eval", "Test"], "Mode should be Train, Eval or Test."

    dataset = eval(module_name)(config, mode, logger, seed)
    loader_config = config[mode]["loader"]
    batch_size = loader_config["batch_size_per_card"]
    drop_last = loader_config.get("drop_last", False)
    shuffle = loader_config["shuffle"]
    num_workers = loader_config["num_workers"]

    shard_index, num_shards = 0, 1
    if mode == "Train" and config["Global"].get("distributed", False):
        shard_index, num_shards = _process_info()

    data_loader = OCRDataLoader(
        dataset=dataset,
        batch_size=batch_size,
        shuffle=shuffle if mode == "Train" else False,
        drop_last=drop_last,
        num_workers=num_workers,
        seed=seed,
        shard_index=shard_index,
        num_shards=num_shards,
        # "process" = torch DataLoader-style fork workers for GT-maker-heavy
        # det pipelines whose Python cost serializes on the GIL.
        worker_mode=loader_config.get("worker_mode", "thread"),
    )
    return data_loader, data_loader  # (loader, "sampler") — set_epoch lives on the loader
