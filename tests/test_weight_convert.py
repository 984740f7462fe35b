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


def _torchvision_resnet18():
    """A torch ResNet18 with torchvision's EXACT module naming, so its
    state_dict keys are byte-identical to torchvision's resnet18 checkpoint
    keys (conv1/bn1/layer{1..4}.{0,1}.{conv,bn}{1,2}/downsample.{0,1}/fc).
    torchvision itself is not installed in this environment; this replica
    stands in for the real .pth the reference downloads
    (reference pytocr/modeling/backbones/det_resnet.py:246-255)."""
    import torch
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, inplanes, planes, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.relu = tnn.ReLU(inplace=True)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.downsample = None
            if stride != 1 or inplanes != planes:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes),
                )

        def forward(self, x):
            identity = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + identity)

    class ResNet18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            self.layer1 = tnn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
            self.layer2 = tnn.Sequential(BasicBlock(64, 128, 2), BasicBlock(128, 128))
            self.layer3 = tnn.Sequential(BasicBlock(128, 256, 2), BasicBlock(256, 256))
            self.layer4 = tnn.Sequential(BasicBlock(256, 512, 2), BasicBlock(512, 512))
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.fc = tnn.Linear(512, 1000)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            c2 = self.layer1(x)
            c3 = self.layer2(c2)
            c4 = self.layer3(c3)
            c5 = self.layer4(c4)
            return [c2, c3, c4, c5]

    model = ResNet18()
    # randomize running stats (fresh BN has mean=0/var=1, which would let a
    # mean<->var or scale<->bias swap slip through the parity check)
    g = torch.Generator().manual_seed(7)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
    return model


@pytest.mark.slow
def test_real_pth_through_converter_cli_full_network_parity(tmp_path):
    """The FULL ingestion path the reference exercises with torchvision
    ImageNet checkpoints, end to end: a torchvision-keyed .pth file ->
    `tools/convert_torch_weights.py` CLI (subprocess) -> converted orbax
    dir -> `load_backbone_pretrained` (the Backbone.ckpt_path config hook,
    tools/train.py) -> all four C2..C5 feature maps match torch eval
    forward."""
    import subprocess

    from pytorchocr_tpu.utils.save_load import load_backbone_pretrained

    model = _torchvision_resnet18().eval()
    sd = model.state_dict()  # includes fc.* and num_batches_tracked (ignored)
    assert "layer4.1.bn2.num_batches_tracked" in sd
    pth = tmp_path / "resnet18-synth.pth"
    torch.save(sd, str(pth))

    out_dir = tmp_path / "converted"
    env = dict(os.environ, JAX_PLATFORMS="cpu", OCR_TPU_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, "tools/convert_torch_weights.py", "--arch", "resnet18",
         "--pth", str(pth), "--out", str(out_dir)],
        cwd=os.path.abspath(os.path.join(os.path.dirname(__file__), "..")),
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    # every backbone tensor must load: stem 5 + 16 block convs * 5 +
    # 3 downsamples (layer{2,3,4}.0) * 5 = 100
    assert "loaded 100 tensors" in proc.stdout, proc.stdout

    flax_model = ResNet(layers=18)
    variables = flax_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )

    class _State:  # the slice of TrainState load_backbone_pretrained uses
        def __init__(self, params, batch_stats):
            self.params, self.batch_stats = params, batch_stats

        def replace(self, **kw):
            return _State(kw.get("params", self.params),
                          kw.get("batch_stats", self.batch_stats))

    state = _State({"backbone": variables["params"]},
                   {"backbone": variables["batch_stats"]})
    state = load_backbone_pretrained(
        state, {"Backbone": {"pretrained": True, "ckpt_path": str(out_dir)}},
        logger=None,
    )

    rng = np.random.RandomState(3)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = flax_model.apply(
        {"params": state.params["backbone"],
         "batch_stats": state.batch_stats["backbone"]},
        jnp.asarray(x), train=False,
    )
    assert len(got) == 4
    for i, (g_, r_) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.asarray(g_), np.transpose(r_.numpy(), (0, 2, 3, 1)),
            atol=2e-3, rtol=1e-3, err_msg="feature map C%d diverges" % (i + 2),
        )


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
