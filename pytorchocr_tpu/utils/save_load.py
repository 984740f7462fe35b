"""Checkpoint save/load (reference pytocr/utils/save_load.py:27-129).

Orbax-backed: each checkpoint prefix (latest / best_accuracy / epoch_N) is a
directory containing the train state pytree (params, batch_stats, opt_state,
step) plus `global_state` {start_epoch, best_model, global_step} — the same
policy surface as the reference's .pth files.  `pretrained_model` restores
params only (finetune), with partial-tree tolerance.
"""

import json
import os

import jax
import numpy as np

from .logging import get_logger

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _mkdir_if_not_exist(path):
    os.makedirs(path, exist_ok=True)


def _save_pytree(path, tree):
    # context-manage the checkpointer: each instance owns threads/buffers
    # that otherwise accumulate across the per-epoch `latest` saves
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(tree), force=True)


def _swap_dirs(staging, path):
    """Replace directory `path` with `staging`, never leaving a window with
    neither present: path -> path.old, staging -> path, drop path.old.
    A crash mid-sequence leaves `path` or `path.old` restorable."""
    import shutil

    old = path + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(staging, path)
    if os.path.isdir(old):
        shutil.rmtree(old)


def _restore_pytree(path, target=None):
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            # the item only provides structure/shape/dtype — build it on
            # host instead of jax.device_get(target), which round-trips
            # the entire freshly-initialized state through the (tunneled)
            # device client for nothing and has wedged there (r4: two
            # eval.py processes parked forever in that D2H with the
            # tunnel socket idle)
            skeleton = jax.tree.map(
                lambda a: np.zeros(a.shape, a.dtype), target
            )
            return ckptr.restore(path, item=skeleton)
        return ckptr.restore(path)


def save_model(state, global_state, cfg, model_dir, logger=None,
               is_best=False, prefix="pytorchocr_tpu"):
    """Save train state + global_state under model_dir/prefix/."""
    if jax.process_index() != 0:
        return
    logger = logger or get_logger()
    _mkdir_if_not_exist(model_dir)
    path = os.path.abspath(os.path.join(model_dir, prefix))
    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    # Save into a staging dir, then atomically-enough swap it in: saving
    # straight onto `path` with force=True has orbax rmtree the previous
    # checkpoint BEFORE writing the new one, so a hang/crash during the
    # save (the exact scenario the save-hang watchdog re-execs out of,
    # tools/program.py) would leave NO resumable `latest` at all.
    # global_state.json is written inside staging BEFORE the swap so a
    # finalized checkpoint always carries its epoch/step metadata.
    staging = path + ".staging"
    if os.path.isdir(staging):
        import shutil

        shutil.rmtree(staging)
    _save_pytree(staging, tree)
    with open(os.path.join(staging, "global_state.json"), "w") as f:
        json.dump(global_state, f)
    _swap_dirs(staging, path)
    if is_best:
        logger.info("save best model to {}".format(path))
    else:
        logger.info("save model in {}".format(path))


def load_model(config, state, logger=None):
    """Resume from Global.checkpoints or finetune from
    Global.pretrained_model.  Returns (state, global_state)."""
    logger = logger or get_logger()
    global_config = config["Global"]
    checkpoints = global_config.get("checkpoints")
    pretrained_model = global_config.get("pretrained_model")
    global_state = {}

    if checkpoints:
        path = os.path.abspath(checkpoints)
        if not os.path.isdir(path) and os.path.isdir(path + ".old"):
            # a crash between the two renames in _swap_dirs left only the
            # previous finalized checkpoint — resume from that
            logger.warning(
                "checkpoint {} missing; falling back to {}.old "
                "(interrupted save)".format(path, path)
            )
            path = path + ".old"
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = _restore_pytree(path, tree)
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]),
        )
        gs_path = os.path.join(path, "global_state.json")
        if os.path.exists(gs_path):
            with open(gs_path) as f:
                global_state = json.load(f)
        logger.info("resume from {}".format(checkpoints))
    elif pretrained_model:
        state = load_pretrained_params(state, pretrained_model, logger)
    else:
        logger.info("train from scratch")
    return state, global_state


_GATES_I = ("ii", "if", "ig", "io")  # input-projection gate kernels (no bias)
_GATES_H = ("hi", "hf", "hg", "ho")  # hidden-projection gate kernels + biases


def _is_old_lstm_cell(node):
    return (
        isinstance(node, dict)
        and all(g in node for g in _GATES_I + _GATES_H)
        and all("kernel" in node[g] for g in _GATES_I + _GATES_H)
    )


def migrate_fused_bilstm(tree):
    """Map pre-fusion BiLSTM checkpoints onto the fused layout.

    Checkpoints saved before the fused direction-batched BiLSTM rewrite
    (necks/rnn.py) stored each direction as a flax ``nn.RNN(OptimizedLSTMCell)``
    — param children ``OptimizedLSTMCell_0`` (fwd) / ``OptimizedLSTMCell_1``
    (bwd), each with per-gate Dense trees ``ii/if/ig/io`` (kernels) and
    ``hi/hf/hg/ho`` (kernels + biases).  The fused module stores stacked
    ``wi (2, C, 4H)`` / ``wh (2, H, 4H)`` / ``b (2, 4H)`` in flax's i,f,g,o
    gate order.  This walks a restored params tree and rewrites every such
    node in place, so old pretrained/finetune checkpoints keep loading.
    """
    if not isinstance(tree, dict):
        return tree
    out = {}
    cells = ("OptimizedLSTMCell_0", "OptimizedLSTMCell_1")
    if all(c in tree and _is_old_lstm_cell(tree[c]) for c in cells):
        wi, wh, b = [], [], []
        for c in cells:
            cell = tree[c]
            wi.append(np.concatenate(
                [np.asarray(cell[g]["kernel"]) for g in _GATES_I], axis=-1))
            wh.append(np.concatenate(
                [np.asarray(cell[g]["kernel"]) for g in _GATES_H], axis=-1))
            b.append(np.concatenate(
                [np.asarray(cell[g]["bias"]) for g in _GATES_H], axis=-1))
        out["wi"] = np.stack(wi)
        out["wh"] = np.stack(wh)
        out["b"] = np.stack(b)
        get_logger().info("migrated pre-fusion BiLSTM params -> wi/wh/b")
        for k, v in tree.items():
            if k not in cells:
                out[k] = migrate_fused_bilstm(v)
        return out
    for k, v in tree.items():
        out[k] = migrate_fused_bilstm(v)
    return out


def _merge_trees(target, source, path=""):
    """Copy matching-by-name leaves from source into target (partial load
    with `module.`-style reconciliation replaced by tree paths)."""
    logger = get_logger()
    if isinstance(target, dict) and isinstance(source, dict):
        out = {}
        for k, v in target.items():
            if k in source:
                out[k] = _merge_trees(v, source[k], path + "/" + str(k))
            else:
                logger.warning("pretrained missing key %s", path + "/" + str(k))
                out[k] = v
        return out
    # compare shapes WITHOUT materializing the target: np.asarray on a
    # device array is a full D2H transfer per leaf (through the TPU
    # tunnel that is minutes of wasted wall per model, and the transfer
    # has wedged the tunneled client — see _restore_pytree)
    t_shape = getattr(target, "shape", None)
    if t_shape is None:
        t_shape = np.asarray(target).shape
    s_shape = getattr(source, "shape", None)
    if s_shape is None:
        s_shape = np.asarray(source).shape
    if tuple(t_shape) != tuple(s_shape):
        logger.warning(
            "shape mismatch at %s: %s vs %s — keeping init",
            path, t_shape, s_shape,
        )
        return target
    return source


def load_backbone_pretrained(state, arch_config, logger=None):
    """Per-backbone ImageNet init (reference det_resnet.py:246-255):
    Architecture.Backbone.{pretrained, ckpt_path} pointing to a converted
    flax params dir (tools/convert_torch_weights.py).  Supports both plain
    and Distillation architectures."""
    logger = logger or get_logger()

    def one(model_key, backbone_cfg, params, stats):
        path = backbone_cfg.get("ckpt_path")
        if not backbone_cfg.get("pretrained") or not path:
            return params, stats
        if not os.path.exists(path):
            logger.info("imagenet ckpt_path not exists: %s", path)
            return params, stats
        restored = _restore_pytree(os.path.abspath(path))
        new_p = _merge_trees(params, restored.get("params", {}))
        new_s = stats
        if restored.get("batch_stats"):
            new_s = _merge_trees(stats, restored["batch_stats"])
        logger.info("load imagenet weights from %s", path)
        return new_p, new_s

    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    if "Models" in arch_config:  # distillation: params keyed models_{i}
        for i, key in enumerate(arch_config["Models"]):
            bcfg = arch_config["Models"][key].get("Backbone", {})
            sub = "models_%d" % i
            if sub in params:
                params[sub], stats[sub] = one(key, bcfg, params[sub], stats.get(sub, {}))
    else:
        bcfg = arch_config.get("Backbone", {})
        params, stats = one("model", bcfg, params, stats)
    return state.replace(params=params, batch_stats=stats)


def load_submodel_pretrained(state, arch_config, logger=None):
    """Per-submodel `pretrained` checkpoints of a DistillationModel
    (reference distillation_model.py:13-45 `load_pretrained_params` per
    sub-model): Architecture.Models.<Name>.pretrained points at a saved
    single-model checkpoint dir (e.g. the Teacher's best_accuracy), whose
    params/batch_stats are grafted onto params['models_<i>'] — submodels
    are ordered as declared in the config, matching flax's auto-naming of
    the models tuple in DistillationModel."""
    logger = logger or get_logger()
    if "Models" not in arch_config:
        return state
    params = None
    stats = None
    for i, key in enumerate(arch_config["Models"]):
        path = arch_config["Models"][key].get("pretrained")
        if not path:
            continue
        path = os.path.abspath(path)
        assert os.path.exists(path), (
            "Models.%s.pretrained does not exist: %s" % (key, path)
        )
        if params is None:
            params = jax.device_get(state.params)
            stats = jax.device_get(state.batch_stats)
        sub = "models_%d" % i
        assert sub in params, "no %s in distillation params" % sub
        restored = _restore_pytree(path)
        params[sub] = _merge_trees(
            params[sub], migrate_fused_bilstm(restored.get("params", restored)))
        if restored.get("batch_stats") and isinstance(stats, dict):
            stats[sub] = _merge_trees(stats.get(sub, {}), restored["batch_stats"])
        logger.info("load %s pretrained from %s", key, path)
    if params is not None:
        state = state.replace(params=params, batch_stats=stats)
    return state


def load_pretrained_params(state, path, logger=None):
    logger = logger or get_logger()
    path = os.path.abspath(path)
    assert os.path.exists(path), "The {} does not exist!".format(path)
    restored = _restore_pytree(path)
    src_params = migrate_fused_bilstm(restored.get("params", restored))
    # no device_get: _merge_trees keeps untouched leaves as-is (device
    # arrays stay on device; loaded leaves arrive as host numpy and are
    # device_put lazily by the first jitted step)
    new_params = _merge_trees(state.params, src_params)
    new_state = state.replace(params=new_params)
    if "batch_stats" in restored and state.batch_stats:
        new_state = new_state.replace(
            batch_stats=_merge_trees(state.batch_stats, restored["batch_stats"])
        )
    logger.info("load pretrain successful from {}".format(path))
    return new_state
