"""Activation-level parity vs PyTorch reference modules.

SURVEY.md §7 hard-part #3: padding, BN eps, activation slopes, stride
placement, and OIHW→HWIO mapping are silent mAP-killers for imported
checkpoints. pycocotools/torchvision are absent offline, but torch
(CPU) IS in the image — so these tests build reference modules with
torchvision-compatible architecture AND state_dict key names, randomize
weights + BN running stats, run both frameworks on the same input, and
demand activation agreement. This is the strongest import-parity
evidence obtainable without pretrained files: any of the bug classes
above produces gross disagreement here.

(Verified sensitivity: reverting the stride-2 symmetric-padding fix or
the P6-from-P5 FPN wiring makes these tests fail loudly.)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _seed_all(n):
    torch.manual_seed(n)
    return np.random.RandomState(n)


def _randomize_bn(bn: nn.BatchNorm2d, rng: np.random.RandomState):
    """Non-trivial affine + running stats so BN actually transforms."""
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rng.uniform(0.5, 1.5, bn.num_features),
                                     dtype=torch.float32))
        bn.bias.copy_(torch.tensor(rng.normal(0, 0.5, bn.num_features),
                                   dtype=torch.float32))
        bn.running_mean.copy_(torch.tensor(rng.normal(0, 0.5, bn.num_features),
                                           dtype=torch.float32))
        bn.running_var.copy_(torch.tensor(rng.uniform(0.5, 1.5, bn.num_features),
                                          dtype=torch.float32))


def _rel_close(a, b, tol):
    scale = np.abs(b).max() + 1e-6
    np.testing.assert_allclose(a / scale, b / scale, atol=tol)


# ---------------------------------------------------------------------------
# darknet Conv-BN-LeakyReLU block (stride 1 and the stride-2 padding trap)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("stride,ksize", [(1, 3), (2, 3), (1, 1)])
def test_conv_bn_leaky_matches_torch(stride, ksize):
    from mydetection_tpu.models import layers as L

    rng = _seed_all(0)
    c_in, c_out, s = 8, 16, 32  # even input: SAME-vs-symmetric pad differs
    conv = nn.Conv2d(c_in, c_out, ksize, stride=stride,
                     padding=(ksize - 1) // 2, bias=False)
    bn = nn.BatchNorm2d(c_out)
    _randomize_bn(bn, rng)
    conv.eval(), bn.eval()

    x = rng.randn(2, s, s, c_in).astype(np.float32)
    with torch.no_grad():
        ref = F.leaky_relu(bn(conv(torch.tensor(x).permute(0, 3, 1, 2))), 0.1)
    ref = ref.permute(0, 2, 3, 1).numpy()

    params = {
        "conv": {"w": jnp.asarray(
            np.transpose(conv.weight.detach().numpy(), (2, 3, 1, 0)))},
        "bn": {"scale": jnp.asarray(bn.weight.detach().numpy()),
               "bias": jnp.asarray(bn.bias.detach().numpy()),
               "mean": jnp.asarray(bn.running_mean.numpy()),
               "var": jnp.asarray(bn.running_var.numpy())},
    }
    got, _ = L.conv_bn_leaky(params, jnp.asarray(x), stride=stride)
    _rel_close(np.asarray(got), ref, 1e-5)


# ---------------------------------------------------------------------------
# ResNet-50 trunk with torchvision names → import_resnet_state_dict → C3-C5
# ---------------------------------------------------------------------------

class _Bottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class _ResNet50Trunk(nn.Module):
    """torchvision-resnet50-compatible trunk (conv1..layer4, no fc)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for li, (planes, blocks, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]):
            down = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4))
            layer = [_Bottleneck(inplanes, planes, stride, down)]
            inplanes = planes * 4
            layer += [_Bottleneck(inplanes, planes) for _ in range(blocks - 1)]
            setattr(self, f"layer{li + 1}", nn.Sequential(*layer))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        c3 = self.layer2(x)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


def _randomized_trunk(seed):
    rng = _seed_all(seed)
    trunk = _ResNet50Trunk().eval()
    for m in trunk.modules():
        if isinstance(m, nn.BatchNorm2d):
            _randomize_bn(m, rng)
    return trunk, rng


def test_resnet50_matches_torch_trunk():
    from mydetection_tpu.models import resnet
    from mydetection_tpu.weight_import import import_resnet_state_dict

    trunk, rng = _randomized_trunk(1)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = trunk(torch.tensor(x).permute(0, 3, 1, 2))
    ref = [t.permute(0, 2, 3, 1).numpy() for t in ref]

    params = resnet.init(jax.random.PRNGKey(0), depth=50)
    state = {k: v.detach().numpy() for k, v in trunk.state_dict().items()}
    params = import_resnet_state_dict(params, state)
    feats, _ = jax.jit(lambda p, v: resnet.apply(p, v, depth=50))(
        params, jnp.asarray(x))
    for got, want, name in zip(feats, ref, ("C3", "C4", "C5")):
        assert got.shape == want.shape, (name, got.shape, want.shape)
        _rel_close(np.asarray(got), want, 2e-4)


# ---------------------------------------------------------------------------
# FPN vs torchvision semantics (P6 from smoothed P5 — LastLevelP6P7 use_P5)
# ---------------------------------------------------------------------------

def test_fpn_matches_torchvision_semantics():
    from mydetection_tpu.models import fpn
    from mydetection_tpu.weight_import import _import_fpn

    rng = _seed_all(2)
    ch = fpn.FPN_CHANNELS
    c3 = rng.randn(1, 16, 16, 512).astype(np.float32)
    c4 = rng.randn(1, 8, 8, 1024).astype(np.float32)
    c5 = rng.randn(1, 4, 4, 2048).astype(np.float32)

    def w(c_out, c_in, k):
        return rng.randn(c_out, c_in, k, k).astype(np.float32) * 0.05
    def b(c_out):
        return rng.randn(c_out).astype(np.float32) * 0.1

    state = {}
    for i, cin in enumerate((512, 1024, 2048)):
        state[f"backbone.fpn.inner_blocks.{i}.0.weight"] = w(ch, cin, 1)
        state[f"backbone.fpn.inner_blocks.{i}.0.bias"] = b(ch)
        state[f"backbone.fpn.layer_blocks.{i}.0.weight"] = w(ch, ch, 3)
        state[f"backbone.fpn.layer_blocks.{i}.0.bias"] = b(ch)
    state["backbone.fpn.extra_blocks.p6.weight"] = w(ch, ch, 3)
    state["backbone.fpn.extra_blocks.p6.bias"] = b(ch)
    state["backbone.fpn.extra_blocks.p7.weight"] = w(ch, ch, 3)
    state["backbone.fpn.extra_blocks.p7.bias"] = b(ch)

    # torch reference: functional mirror of torchvision FPN + LastLevelP6P7
    def tconv(x, key, stride=1, pad=None):
        wt = torch.tensor(state[key + ".weight"])
        bt = torch.tensor(state[key + ".bias"])
        if pad is None:
            pad = (wt.shape[-1] - 1) // 2
        return F.conv2d(x, wt, bt, stride=stride, padding=pad)

    tc3 = torch.tensor(c3).permute(0, 3, 1, 2)
    tc4 = torch.tensor(c4).permute(0, 3, 1, 2)
    tc5 = torch.tensor(c5).permute(0, 3, 1, 2)
    with torch.no_grad():
        l5 = tconv(tc5, "backbone.fpn.inner_blocks.2.0")
        l4 = tconv(tc4, "backbone.fpn.inner_blocks.1.0") + \
            F.interpolate(l5, scale_factor=2, mode="nearest")
        l3 = tconv(tc3, "backbone.fpn.inner_blocks.0.0") + \
            F.interpolate(l4, scale_factor=2, mode="nearest")
        p3 = tconv(l3, "backbone.fpn.layer_blocks.0.0")
        p4 = tconv(l4, "backbone.fpn.layer_blocks.1.0")
        p5 = tconv(l5, "backbone.fpn.layer_blocks.2.0")
        p6 = tconv(p5, "backbone.fpn.extra_blocks.p6", stride=2)
        p7 = tconv(F.relu(p6), "backbone.fpn.extra_blocks.p7", stride=2)
    ref = [t.permute(0, 2, 3, 1).numpy() for t in (p3, p4, p5, p6, p7)]

    params = _import_fpn(fpn.init(jax.random.PRNGKey(0)), state)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    got = fpn.apply(params, (jnp.asarray(c3), jnp.asarray(c4), jnp.asarray(c5)))
    for g, r, name in zip(got, ref, ("P3", "P4", "P5", "P6", "P7")):
        assert g.shape == r.shape, (name, g.shape, r.shape)
        _rel_close(np.asarray(g), r, 1e-5)
