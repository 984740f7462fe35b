"""Convert torchvision-style ImageNet checkpoints (.pth) into flax param
trees for pytorchocr_tpu backbones.

The reference loads torchvision ResNet/MobileNetV3/ShuffleNetV2 ImageNet
weights directly (e.g. backbones/det_resnet.py:246-255); here the same
.pth state_dicts are re-laid out for the NHWC flax modules:
conv OIHW -> HWIO, BN weight/bias -> scale/bias, running stats ->
batch_stats.

Usage:
  python tools/convert_torch_weights.py --arch resnet18 \
      --pth resnet18-5c106cde.pth --out ./model_zoo/resnet18_imagenet
"""

import argparse
import os
import sys

__dir__ = os.path.dirname(os.path.abspath(__file__))
sys.path.append(os.path.abspath(os.path.join(__dir__, "..")))

import numpy as np


def _t_conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def resnet_key_map(layers):
    """flax path (params|stats, tuple path) -> torchvision key for the det
    ResNet (7x7 stem variant).  Block structure: layer{s}_block{i}/{conv1,
    conv2[,conv3],downsample}/{conv,bn}."""
    from pytorchocr_tpu.modeling.backbones.det_resnet import _SPECS

    block_type, counts = _SPECS[layers]
    n_convs = 2 if block_type == "basic" else 3
    mapping = {}

    def add_cbna(flax_prefix, torch_conv, torch_bn):
        mapping[("params",) + flax_prefix + ("conv", "kernel")] = (torch_conv + ".weight", _t_conv)
        mapping[("params",) + flax_prefix + ("bn", "scale")] = (torch_bn + ".weight", np.asarray)
        mapping[("params",) + flax_prefix + ("bn", "bias")] = (torch_bn + ".bias", np.asarray)
        mapping[("batch_stats",) + flax_prefix + ("bn", "mean")] = (torch_bn + ".running_mean", np.asarray)
        mapping[("batch_stats",) + flax_prefix + ("bn", "var")] = (torch_bn + ".running_var", np.asarray)

    add_cbna(("stem",), "conv1", "bn1")
    for s in range(4):
        for i in range(counts[s]):
            fp = ("layer%d_block%d" % (s + 1, i),)
            tp = "layer%d.%d" % (s + 1, i)
            for c in range(1, n_convs + 1):
                add_cbna(fp + ("conv%d" % c,), "%s.conv%d" % (tp, c), "%s.bn%d" % (tp, c))
            # downsample exists on first block of strided/width-changing stages
            add_cbna(fp + ("downsample",), tp + ".downsample.0", tp + ".downsample.1")
    return mapping


def apply_mapping(params, batch_stats, state_dict, mapping, logger=print):
    """Fill flax params/batch_stats from a torch state_dict via mapping.
    Missing keys are left at init; shape mismatches are skipped loudly."""
    tree = {"params": params, "batch_stats": batch_stats}

    def set_path(root, path, value):
        cur = root
        for k in path[:-1]:
            if k not in cur:
                return False
            cur = cur[k]
        if path[-1] not in cur:
            return False
        target = cur[path[-1]]
        if tuple(np.shape(target)) != tuple(value.shape):
            logger("shape mismatch at %s: %s vs %s" % (path, np.shape(target), value.shape))
            return False
        cur[path[-1]] = value.astype(np.asarray(target).dtype)
        return True

    loaded = 0
    for flax_path, (torch_key, fn) in mapping.items():
        if torch_key not in state_dict:
            continue
        value = fn(np.asarray(state_dict[torch_key]))
        if set_path(tree, flax_path, value):
            loaded += 1
    logger("loaded %d tensors" % loaded)
    return tree["params"], tree["batch_stats"]


def convert_resnet(pth_path, layers, out_dir):
    import torch
    import jax

    # honor the same platform override as tools/program.py:preprocess —
    # weight conversion is pure layout work, it must never queue behind a
    # busy TPU tunnel (and JAX_PLATFORMS alone is not honored once the
    # axon PJRT plugin is registered)
    platform = os.environ.get("OCR_TPU_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    import jax.numpy as jnp

    from pytorchocr_tpu.modeling.backbones.det_resnet import ResNet
    from pytorchocr_tpu.utils.save_load import _save_pytree

    state_dict = torch.load(pth_path, map_location="cpu", weights_only=True)
    state_dict = {k: v.numpy() for k, v in state_dict.items()}

    model = ResNet(layers=layers)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    params = jax.device_get(variables["params"])
    batch_stats = jax.device_get(variables["batch_stats"])

    mapping = resnet_key_map(layers)
    params, batch_stats = apply_mapping(params, batch_stats, state_dict, mapping)
    _save_pytree(os.path.abspath(out_dir), {"params": {"backbone": params},
                                            "batch_stats": {"backbone": batch_stats}})
    print("saved converted weights to", out_dir)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", type=str, required=True,
                        help="resnet18 | resnet34 | resnet50 | resnet101 | resnet152")
    parser.add_argument("--pth", type=str, required=True)
    parser.add_argument("--out", type=str, required=True)
    args = parser.parse_args()

    if args.arch.startswith("resnet"):
        convert_resnet(args.pth, int(args.arch.replace("resnet", "")), args.out)
    else:
        raise SystemExit("unsupported arch %s" % args.arch)
