from .config import ArgsParser, AttrDict, load_config, merge_config, save_config
from .logging import get_logger, print_dict
from .stats import TrainingStats

__all__ = [
    "ArgsParser",
    "AttrDict",
    "load_config",
    "merge_config",
    "save_config",
    "get_logger",
    "print_dict",
    "TrainingStats",
]
