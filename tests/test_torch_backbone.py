"""Backbone/neck checkpoint parity: the jax ResNet+FPN+DenseDepthNet must
reproduce a torch replica in the released state_dict layout through
`torch_to_flax` conversion.

Complements tests/test_torch_composite.py (which proves the assembled
HEAD matches torch through the converter): this covers the other half of
a released checkpoint — `img_backbone.*` (torchvision/mmdet ResNet-50
naming, reference config:79-90), `img_neck.*` (mmdet FPN, config:91-99)
and `depth_branch.*` (models/blocks.py:264-301) — so every parameter
family in a real .pth now has a numeric conversion oracle.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from simpb_tpu.configs.base import ModelConfig
from simpb_tpu.models.backbone import FPN, DenseDepthNet, ResNet
from simpb_tpu.utils.torch_convert import torch_to_flax

pytestmark = pytest.mark.medium

IMG_W, IMG_H = 64, 32


class BottleneckT(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + identity)


class ResNet50T(tnn.Module):
    """torchvision-naming ResNet-50 trunk returning C2..C5."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for stage, (planes, blocks) in enumerate(
            [(64, 3), (128, 4), (256, 6), (512, 3)]
        ):
            layers = []
            for i in range(blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                layers.append(
                    BottleneckT(inplanes, planes, stride, downsample=(i == 0))
                )
                inplanes = planes * 4
            setattr(self, f"layer{stage + 1}", tnn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            outs.append(x)
        return outs


class ConvModuleT(tnn.Module):
    """mmdet ConvModule shell: parameters live under `.conv`."""

    def __init__(self, cin, cout, k, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, **kw)

    def forward(self, x):
        return self.conv(x)


class FPNT(tnn.Module):
    """mmdet FPN (4-in 4-out, nearest top-down) in mmdet naming."""

    def __init__(self, in_channels=(256, 512, 1024, 2048), out_channels=256):
        super().__init__()
        self.lateral_convs = tnn.ModuleList(
            [ConvModuleT(c, out_channels, 1) for c in in_channels]
        )
        self.fpn_convs = tnn.ModuleList(
            [ConvModuleT(out_channels, out_channels, 3, padding=1)
             for _ in in_channels]
        )

    def forward(self, inputs):
        laterals = [l(x) for l, x in zip(self.lateral_convs, inputs)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + tnn.functional.interpolate(
                laterals[i], size=laterals[i - 1].shape[2:], mode="nearest"
            )
        return [f(l) for f, l in zip(self.fpn_convs, laterals)]


class DepthBranchT(tnn.Module):
    """DenseDepthNet replica (reference models/blocks.py:264-301)."""

    def __init__(self, channels=256, num_layers=3, equal_focal=100.0):
        super().__init__()
        self.equal_focal = equal_focal
        self.depth_layers = tnn.ModuleList(
            [tnn.Conv2d(channels, 1, 1) for _ in range(num_layers)]
        )

    def forward(self, feats, focal):
        out = []
        for layer, feat in zip(self.depth_layers, feats):
            d = layer(feat).exp() * (focal / self.equal_focal)
            out.append(d[:, 0])
        return out


def _randomize_bn_stats(module, gen):
    """Random running stats + affine so BN eps/layout bugs can't hide."""
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5, generator=gen)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=gen) + 0.5
                )
                m.weight.normal_(1.0, 0.2, generator=gen)
                m.bias.normal_(0, 0.2, generator=gen)


@pytest.fixture(scope="module")
def converted():
    gen = torch.Generator().manual_seed(0)
    torch.manual_seed(0)
    trunk, neck, depth = ResNet50T().eval(), FPNT().eval(), DepthBranchT().eval()
    for m in (trunk, neck, depth):
        _randomize_bn_stats(m, gen)

    sd = {}
    for prefix, mod in (
        ("img_backbone", trunk), ("img_neck", neck), ("depth_branch", depth)
    ):
        for k, v in mod.state_dict().items():
            if k.endswith("num_batches_tracked"):
                continue
            sd[f"{prefix}.{k}"] = v.numpy()
    params, stats = torch_to_flax(sd, ModelConfig())
    return trunk, neck, depth, params, stats


def _torch_forward(trunk, neck, depth, img, focal):
    with torch.no_grad():
        feats = trunk(torch.from_numpy(img))
        fpn = neck(feats)
        d = depth(fpn[:3], torch.tensor(focal))
    return ([f.permute(0, 2, 3, 1).numpy() for f in feats],
            [f.permute(0, 2, 3, 1).numpy() for f in fpn],
            [x.numpy() for x in d])


def test_backbone_fpn_depth_match_torch(converted):
    trunk, neck, depth, params, stats = converted
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, IMG_H, IMG_W)).astype(np.float32)
    focal = 120.0
    t_feats, t_fpn, t_depth = _torch_forward(trunk, neck, depth, img, focal)

    x = jnp.asarray(img.transpose(0, 2, 3, 1))
    j_feats = jax.jit(lambda x: ResNet(depth=50).apply(
        {"params": params["img_backbone"],
         "batch_stats": stats["img_backbone"]}, x, train=False))(x)
    for i, (tf, jf) in enumerate(zip(t_feats, j_feats)):
        np.testing.assert_allclose(
            np.asarray(jf), tf, atol=2e-3, rtol=1e-4,
            err_msg=f"trunk C{i + 2}")

    j_fpn = jax.jit(lambda fs: FPN().apply(
        {"params": params["img_neck"]}, fs))(j_feats)
    for i, (tf, jf) in enumerate(zip(t_fpn, j_fpn)):
        np.testing.assert_allclose(
            np.asarray(jf), tf, atol=2e-3, rtol=1e-4, err_msg=f"P{i + 2}")

    # DenseDepthNet consumes [bs, cams, H, W, C]; fold bs as cams=2, bs=1
    feats5 = [jnp.asarray(f)[None] for f in j_fpn[:3]]
    foc = jnp.full((1, 2), focal, jnp.float32)
    j_depth = jax.jit(lambda fs, fo: DenseDepthNet().apply(
        {"params": params["depth_branch"]}, fs, fo))(feats5, foc)
    for i, (td, jd) in enumerate(zip(t_depth, j_depth)):
        np.testing.assert_allclose(
            np.asarray(jd)[0], td, atol=2e-3, rtol=1e-3,
            err_msg=f"depth level {i}")
