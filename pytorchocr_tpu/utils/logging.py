"""Process-aware logger (reference: pytocr/utils/logging.py:16-61).

On multi-host TPU pods, only jax.process_index()==0 logs at INFO; other
processes are raised to ERROR so logs stay readable.
"""

import functools
import logging
import os
import sys

logger_initialized = {}


def _process_index():
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


@functools.lru_cache()
def get_logger(name="pytorchocr_tpu", log_file=None, log_level=logging.INFO):
    logger = logging.getLogger(name)
    if name in logger_initialized:
        return logger
    for logger_name in logger_initialized:
        if name.startswith(logger_name):
            return logger

    formatter = logging.Formatter(
        "[%(asctime)s] %(name)s %(levelname)s: %(message)s",
        datefmt="%Y/%m/%d %H:%M:%S",
    )

    stream_handler = logging.StreamHandler(stream=sys.stdout)
    stream_handler.setFormatter(formatter)
    logger.addHandler(stream_handler)

    rank = _process_index()
    if rank == 0 and log_file is not None:
        log_file_folder = os.path.dirname(log_file)
        if log_file_folder:
            os.makedirs(log_file_folder, exist_ok=True)
        file_handler = logging.FileHandler(log_file, "a")
        file_handler.setFormatter(formatter)
        logger.addHandler(file_handler)

    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    logger_initialized[name] = True
    return logger


def print_dict(d, logger, delimiter=0):
    """Recursively pretty-print a config dict (reference utils/utility.py:4-18)."""
    for k, v in d.items():
        if isinstance(v, dict):
            logger.info("{}{} : ".format(delimiter * " ", k))
            print_dict(v, logger, delimiter + 4)
        elif isinstance(v, list) and len(v) >= 1 and isinstance(v[0], dict):
            logger.info("{}{} : ".format(delimiter * " ", k))
            for value in v:
                print_dict(value, logger, delimiter + 4)
        else:
            logger.info("{}{} : {}".format(delimiter * " ", k, v))
