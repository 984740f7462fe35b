"""torch->flax weight conversion: key mapping coverage + cross-framework
numerical parity of one conv+bn stage (torch functional vs flax)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "tools")))

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from convert_torch_weights import apply_mapping, resnet_key_map
from pytorchocr_tpu.modeling.backbones.det_resnet import ResNet


def _synth_state_dict(mapping, params, batch_stats):
    """Build a torchvision-shaped state_dict with random values matching the
    flax tree's shapes (inverse of the conversion transposes)."""
    rng = np.random.RandomState(0)
    tree = {"params": params, "batch_stats": batch_stats}
    sd = {}
    for flax_path, (torch_key, fn) in mapping.items():
        cur = tree
        ok = True
        for k in flax_path:
            if k not in cur:
                ok = False
                break
            cur = cur[k]
        if not ok:
            continue
        shape = np.shape(cur)
        val = rng.randn(*shape).astype(np.float32)
        if fn.__name__ == "_t_conv":  # flax HWIO -> torch OIHW
            sd[torch_key] = np.transpose(val, (3, 2, 0, 1))
        else:
            sd[torch_key] = val
    return sd


def test_resnet18_mapping_roundtrip():
    model = ResNet(layers=18)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    mapping = resnet_key_map(18)
    sd = _synth_state_dict(mapping, params, stats)
    # every torchvision resnet18 backbone tensor must be covered
    assert "conv1.weight" in sd and "layer4.1.bn2.running_var" in sd

    msgs = []
    new_params, new_stats = apply_mapping(params, stats, sd, mapping, logger=msgs.append)
    assert not any("mismatch" in m for m in msgs), msgs
    # stem kernel actually replaced with the transposed synthetic tensor
    got = np.asarray(new_params["stem"]["conv"]["kernel"])
    want = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(got, want)


def test_conv_bn_numerical_parity_with_torch():
    """One ConvBNAct stage must match torch conv2d+batch_norm bit-for-bit-ish
    after weight conversion (validates layout transposes end to end)."""
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    w_torch = rng.randn(8, 3, 3, 3).astype(np.float32)  # OIHW
    gamma = rng.rand(8).astype(np.float32) + 0.5
    beta = rng.randn(8).astype(np.float32)
    mean = rng.randn(8).astype(np.float32)
    var = rng.rand(8).astype(np.float32) + 0.5

    # torch reference (NCHW)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    yt = F.conv2d(xt, torch.from_numpy(w_torch), stride=1, padding=1)
    yt = F.batch_norm(
        yt, torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(gamma), torch.from_numpy(beta), training=False, eps=1e-5,
    )
    yt = np.transpose(yt.numpy(), (0, 2, 3, 1))

    # flax ConvBNAct with converted weights
    from pytorchocr_tpu.modeling.common import ConvBNAct

    mod = ConvBNAct(8, 3, 1, act=None)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    variables = jax.device_get(variables)
    variables["params"]["conv"]["kernel"] = np.transpose(w_torch, (2, 3, 1, 0))
    variables["params"]["bn"]["scale"] = gamma
    variables["params"]["bn"]["bias"] = beta
    variables["batch_stats"]["bn"]["mean"] = mean
    variables["batch_stats"]["bn"]["var"] = var
    yf = np.asarray(mod.apply(variables, jnp.asarray(x), False))

    np.testing.assert_allclose(yf, yt, atol=1e-4)
