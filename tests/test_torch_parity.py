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
    """torchvision-resnet-compatible trunk (conv1..layer4, no fc).
    Default block counts are resnet50; pass layers=(3, 4, 23, 3) for
    the resnet101 trunk (retinanet_r101 parity)."""

    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for li, (planes, blocks, stride) in enumerate(
                zip((64, 128, 256, 512), layers, (1, 2, 2, 2))):
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


def _randomized_trunk(seed, layers=(3, 4, 6, 3)):
    rng = _seed_all(seed)
    trunk = _ResNet50Trunk(layers).eval()
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

def _fpn_state(rng):
    from mydetection_tpu.models import fpn

    ch = fpn.FPN_CHANNELS

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
    return state


def _torch_fpn(state, tc3, tc4, tc5):
    """Functional mirror of torchvision FPN + LastLevelP6P7(use_P5)."""
    def tconv(x, key, stride=1):
        wt = torch.tensor(state[key + ".weight"])
        bt = torch.tensor(state[key + ".bias"])
        return F.conv2d(x, wt, bt, stride=stride,
                        padding=(wt.shape[-1] - 1) // 2)

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
    return [p3, p4, p5, p6, p7]


def test_fpn_matches_torchvision_semantics():
    from mydetection_tpu.models import fpn
    from mydetection_tpu.weight_import import _import_fpn

    rng = _seed_all(2)
    c3 = rng.randn(1, 16, 16, 512).astype(np.float32)
    c4 = rng.randn(1, 8, 8, 1024).astype(np.float32)
    c5 = rng.randn(1, 4, 4, 2048).astype(np.float32)
    state = _fpn_state(rng)

    tc3 = torch.tensor(c3).permute(0, 3, 1, 2)
    tc4 = torch.tensor(c4).permute(0, 3, 1, 2)
    tc5 = torch.tensor(c5).permute(0, 3, 1, 2)
    ref = [t.permute(0, 2, 3, 1).numpy()
           for t in _torch_fpn(state, tc3, tc4, tc5)]

    params = _import_fpn(fpn.init(jax.random.PRNGKey(0)), state)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    got = fpn.apply(params, (jnp.asarray(c3), jnp.asarray(c4), jnp.asarray(c5)))
    for g, r, name in zip(got, ref, ("P3", "P4", "P5", "P6", "P7")):
        assert g.shape == r.shape, (name, g.shape, r.shape)
        _rel_close(np.asarray(g), r, 1e-5)


# ---------------------------------------------------------------------------
# FULL-model import parity: trunk + FPN + head, torchvision key names
# ---------------------------------------------------------------------------

def _head_state(rng, *, fcos: bool, num_classes: int = 7):
    """torchvision retinanet/fcos head entries (Conv2dNormActivation names)."""
    ch = 256

    def w(c_out, c_in, k=3):
        return rng.randn(c_out, c_in, k, k).astype(np.float32) * 0.05
    def b(c_out):
        return rng.randn(c_out).astype(np.float32) * 0.1

    state = {}
    for tv in ("classification_head", "regression_head"):
        for i in range(4):
            state[f"head.{tv}.conv.{i}.0.weight"] = w(ch, ch)
            if fcos:  # GroupNorm at .1, conv bias=False
                state[f"head.{tv}.conv.{i}.1.weight"] = \
                    rng.uniform(0.5, 1.5, ch).astype(np.float32)
                state[f"head.{tv}.conv.{i}.1.bias"] = b(ch)
            else:
                state[f"head.{tv}.conv.{i}.0.bias"] = b(ch)
    a = 1 if fcos else 9
    state["head.classification_head.cls_logits.weight"] = w(a * num_classes, ch)
    state["head.classification_head.cls_logits.bias"] = b(a * num_classes)
    state["head.regression_head.bbox_reg.weight"] = w(a * 4, ch)
    state["head.regression_head.bbox_reg.bias"] = b(a * 4)
    if fcos:
        state["head.regression_head.bbox_ctrness.weight"] = w(1, ch)
        state["head.regression_head.bbox_ctrness.bias"] = b(1)
    return state


def _torch_group_norm(x, weight, bias, groups=32):
    return F.group_norm(x, groups, torch.tensor(weight), torch.tensor(bias),
                        eps=1e-5)


def _torch_subnet(state, tv, x, *, fcos: bool):
    with torch.no_grad():
        for i in range(4):
            wt = torch.tensor(state[f"head.{tv}.conv.{i}.0.weight"])
            if fcos:
                x = F.conv2d(x, wt, None, padding=1)
                x = _torch_group_norm(x, state[f"head.{tv}.conv.{i}.1.weight"],
                                      state[f"head.{tv}.conv.{i}.1.bias"])
            else:
                bt = torch.tensor(state[f"head.{tv}.conv.{i}.0.bias"])
                x = F.conv2d(x, wt, bt, padding=1)
            x = F.relu(x)
    return x


def _torch_final(state, key, x):
    with torch.no_grad():
        return F.conv2d(x, torch.tensor(state[key + ".weight"]),
                        torch.tensor(state[key + ".bias"]), padding=1)


def _full_state(seed, *, fcos: bool, num_classes: int,
                layers=(3, 4, 6, 3)):
    trunk, rng = _randomized_trunk(seed, layers)
    state = {f"backbone.body.{k}": v.detach().numpy()
             for k, v in trunk.state_dict().items()}
    state.update(_fpn_state(rng))
    state.update(_head_state(rng, fcos=fcos, num_classes=num_classes))
    return trunk, state, rng


def test_retinanet_full_import_matches_torch():
    """Whole-chain: torchvision-named state dict → import_retinanet_state_dict
    → backbone+FPN+subnets; activations must match the torch mirror,
    INCLUDING the (B, HWA, C) anchor-major flatten order."""
    from mydetection_tpu.models import fpn as fpn_mod
    from mydetection_tpu.models import resnet, retinanet
    from mydetection_tpu.weight_import import import_retinanet_state_dict

    nc = 7
    trunk, state, rng = _full_state(3, fcos=False, num_classes=nc)
    x = rng.randn(1, 128, 128, 3).astype(np.float32)

    params = {
        "backbone": resnet.init(jax.random.PRNGKey(0), depth=50),
        "fpn": fpn_mod.init(jax.random.PRNGKey(1)),
        "head": retinanet.init(jax.random.PRNGKey(2), nc),
    }
    params = import_retinanet_state_dict(params, state)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    def fwd(p, v):
        feats, _ = resnet.apply(p["backbone"], v, depth=50)
        pyr = fpn_mod.apply(p["fpn"], feats)
        return retinanet.apply(p["head"], pyr, num_classes=nc)

    cls_logits, box_deltas = jax.jit(fwd)(params, jnp.asarray(x))

    tx = torch.tensor(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        tc3, tc4, tc5 = trunk(tx)
    pyr_t = _torch_fpn(state, tc3, tc4, tc5)
    ref_cls, ref_box = [], []
    for p in pyr_t:
        cl = _torch_final(state, "head.classification_head.cls_logits",
                          _torch_subnet(state, "classification_head", p,
                                        fcos=False))
        bx = _torch_final(state, "head.regression_head.bbox_reg",
                          _torch_subnet(state, "regression_head", p,
                                        fcos=False))
        B, _, H, W = cl.shape
        ref_cls.append(cl.permute(0, 2, 3, 1).reshape(B, H * W * 9, nc).numpy())
        ref_box.append(bx.permute(0, 2, 3, 1).reshape(B, H * W * 9, 4).numpy())
    _rel_close(np.asarray(cls_logits), np.concatenate(ref_cls, 1), 3e-4)
    _rel_close(np.asarray(box_deltas), np.concatenate(ref_box, 1), 3e-4)


def test_fcos_full_import_matches_torch():
    """Whole-chain FCOS: GroupNorm towers (bias-less convs — torchvision
    Conv2dNormActivation) + centerness on the regression tower."""
    from mydetection_tpu.models import fcos as fcos_mod
    from mydetection_tpu.models import fpn as fpn_mod
    from mydetection_tpu.models import resnet
    from mydetection_tpu.weight_import import import_fcos_state_dict

    nc = 7
    trunk, state, rng = _full_state(4, fcos=True, num_classes=nc)
    x = rng.randn(1, 128, 128, 3).astype(np.float32)

    params = {
        "backbone": resnet.init(jax.random.PRNGKey(0), depth=50),
        "fpn": fpn_mod.init(jax.random.PRNGKey(1)),
        "head": fcos_mod.init(jax.random.PRNGKey(2), nc),
    }
    params = import_fcos_state_dict(params, state)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    def fwd(p, v):
        feats, _ = resnet.apply(p["backbone"], v, depth=50)
        pyr = fpn_mod.apply(p["fpn"], feats)
        # torchvision-imported weights decode relu-linear (see
        # fcos.apply docstring) — using the paper's exp decode here
        # would make this parity test circular AND wrong
        return fcos_mod.apply(p["head"], pyr, num_classes=nc,
                              ltrb_decode="linear")

    cls_logits, ltrb, ctr_logits = jax.jit(fwd)(params, jnp.asarray(x))

    tx = torch.tensor(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        tc3, tc4, tc5 = trunk(tx)
    pyr_t = _torch_fpn(state, tc3, tc4, tc5)
    ref_cls, ref_box, ref_ctr = [], [], []
    for li, p in enumerate(pyr_t):
        ct = _torch_subnet(state, "classification_head", p, fcos=True)
        bt = _torch_subnet(state, "regression_head", p, fcos=True)
        cl = _torch_final(state, "head.classification_head.cls_logits", ct)
        bx = _torch_final(state, "head.regression_head.bbox_reg", bt)
        cn = _torch_final(state, "head.regression_head.bbox_ctrness", bt)
        B, _, H, W = cl.shape
        ref_cls.append(cl.permute(0, 2, 3, 1).reshape(B, H * W, nc).numpy())
        # torchvision decode: F.relu on the regression output, then
        # BoxLinearCoder(normalize_by_size) multiplies by the per-level
        # anchor size, which equals the stride (sizes (8,16,...,128))
        raw = bx.permute(0, 2, 3, 1).reshape(B, H * W, 4).numpy()
        ref_box.append(np.maximum(raw, 0.0) * fcos_mod.STRIDES[li])
        ref_ctr.append(cn.permute(0, 2, 3, 1).reshape(B, H * W).numpy())
    _rel_close(np.asarray(cls_logits), np.concatenate(ref_cls, 1), 3e-4)
    _rel_close(np.asarray(ctr_logits), np.concatenate(ref_ctr, 1), 3e-4)
    got_box = np.asarray(ltrb)
    want_box = np.concatenate(ref_box, 1)
    np.testing.assert_allclose(got_box, want_box, rtol=2e-3)


# ---------------------------------------------------------------------------
# Darknet-53 backbone: torch mirror → darknet BINARY stream → our loader
# ---------------------------------------------------------------------------

class _DarknetConvBN(nn.Module):
    def __init__(self, c_in, c_out, k, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(c_in, c_out, k, stride=stride,
                              padding=(k - 1) // 2, bias=False)
        self.bn = nn.BatchNorm2d(c_out)

    def forward(self, x):
        return F.leaky_relu(self.bn(self.conv(x)), 0.1)

    def binary_chunks(self):
        """darknet .weights layout for a BN conv: [β, γ, μ, σ², w OIHW]."""
        return [self.bn.bias.detach().numpy(),
                self.bn.weight.detach().numpy(),
                self.bn.running_mean.numpy(),
                self.bn.running_var.numpy(),
                self.conv.weight.detach().numpy().ravel()]


class _TorchDarknet53(nn.Module):
    """Darknet-53 trunk mirroring darknet.cfg order: stem, then per
    stage a stride-2 downsample conv + N residual (1x1 c/2 → 3x3 c)
    blocks. Emits C3/C4/C5."""

    def __init__(self):
        super().__init__()
        from mydetection_tpu.models.darknet import STAGE_BLOCKS, STAGE_CHANNELS
        self.seq = nn.ModuleList([_DarknetConvBN(3, 32, 3)])
        self.res_spans = []  # (first_block_index, nblocks) per stage
        c_in = 32
        for nblocks, c_out in zip(STAGE_BLOCKS, STAGE_CHANNELS):
            self.seq.append(_DarknetConvBN(c_in, c_out, 3, stride=2))
            self.res_spans.append((len(self.seq), nblocks))
            for _ in range(nblocks):
                self.seq.append(_DarknetConvBN(c_out, c_out // 2, 1))
                self.seq.append(_DarknetConvBN(c_out // 2, c_out, 3))
            c_in = c_out

    def forward(self, x):
        feats = []
        i = 0
        x = self.seq[i](x); i += 1
        for si, (start, nblocks) in enumerate(self.res_spans):
            x = self.seq[i](x); i += 1          # downsample
            for _ in range(nblocks):
                y = self.seq[i + 1](self.seq[i](x))
                x = x + y
                i += 2
            if si >= 2:
                feats.append(x)
        return feats


def test_darknet53_matches_torch_via_binary(tmp_path):
    """Full-backbone parity through the BINARY weight path: serialize a
    randomized torch Darknet-53 into darknet's .weights layout (backbone
    prefix only), load via load_darknet_weights' conv sequence, and
    compare C3/C4/C5 — locks the stem/stage/residual wiring AND the
    [β,γ,μ,σ²,OIHW] stream convention against real torch semantics."""
    import mydetection_tpu.weight_import as wi
    from mydetection_tpu.models import darknet

    rng = _seed_all(5)
    tnet = _TorchDarknet53().eval()
    for m in tnet.modules():
        if isinstance(m, nn.BatchNorm2d):
            _randomize_bn(m, rng)

    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.tensor(x).permute(0, 3, 1, 2))
    ref = [t.permute(0, 2, 3, 1).numpy() for t in ref]

    # our backbone param tree + the loader's cfg-order conv sequence,
    # truncated to the backbone prefix (the 52 BN convs come first)
    params = {"backbone": darknet.init(jax.random.PRNGKey(0))}
    seq = wi._yolov3_conv_sequence(
        {"backbone": params["backbone"],
         "head": _dummy_head_for_sequence()})[:52]
    chunks = []
    for block in tnet.seq:
        chunks.extend(block.binary_chunks())
    stream = np.concatenate([np.asarray(c, np.float32).ravel()
                             for c in chunks])
    assert len(seq) == len(tnet.seq) == 52

    pos = 0
    loaded = wi.jax_to_numpy(params)
    seq_loaded = wi._yolov3_conv_sequence(
        {"backbone": loaded["backbone"],
         "head": _dummy_head_for_sequence()})[:52]
    for node, has_bn in seq_loaded:
        assert has_bn
        c_out = node["conv"]["w"].shape[-1]
        kh, kw, c_in, _ = node["conv"]["w"].shape
        node["bn"]["bias"] = stream[pos:pos + c_out]; pos += c_out
        node["bn"]["scale"] = stream[pos:pos + c_out]; pos += c_out
        node["bn"]["mean"] = stream[pos:pos + c_out]; pos += c_out
        node["bn"]["var"] = stream[pos:pos + c_out]; pos += c_out
        n = c_out * c_in * kh * kw
        node["conv"]["w"] = np.transpose(
            stream[pos:pos + n].reshape(c_out, c_in, kh, kw), (2, 3, 1, 0))
        pos += n
    assert pos == len(stream)

    feats, _ = jax.jit(darknet.apply)(
        jax.tree_util.tree_map(jnp.asarray, loaded["backbone"]),
        jnp.asarray(x))
    for got, want, name in zip(feats, ref, ("C3", "C4", "C5")):
        assert got.shape == want.shape, (name, got.shape, want.shape)
        _rel_close(np.asarray(got), want, 2e-4)


def _dummy_head_for_sequence():
    """Minimal head tree accepted by _yolov3_conv_sequence (the first 52
    entries — the backbone — are all this test consumes)."""
    conv = {"conv": {"w": np.zeros((1, 1, 1, 1), np.float32)}, "bn": {}}
    out = {"w": np.zeros((1, 1, 1, 1), np.float32), "b": np.zeros(1)}
    head = {}
    for block in ("block5", "block4", "block3"):
        head[block] = {f"c{i}": conv for i in range(5)}
    for name in ("head5", "head4", "head3"):
        head[name] = {"conv": conv, "out": out}
    head["lateral4"] = conv
    head["lateral3"] = conv
    return head


# ---------------------------------------------------------------------------
# FULL YOLOv3 (backbone + neck + heads) through a real .weights file
# ---------------------------------------------------------------------------

class _TorchYoloNeck(nn.Module):
    """Mirror of the YOLOv3 neck/heads in darknet cfg order."""

    def __init__(self, num_classes: int):
        super().__init__()
        no = 3 * (5 + num_classes)

        def conv5(c_in, c_mid):
            return nn.ModuleList([
                _DarknetConvBN(c_in, c_mid, 1),
                _DarknetConvBN(c_mid, c_mid * 2, 3),
                _DarknetConvBN(c_mid * 2, c_mid, 1),
                _DarknetConvBN(c_mid, c_mid * 2, 3),
                _DarknetConvBN(c_mid * 2, c_mid, 1),
            ])

        self.block5 = conv5(1024, 512)
        self.head5_conv = _DarknetConvBN(512, 1024, 3)
        self.head5_out = nn.Conv2d(1024, no, 1, bias=True)
        self.lateral4 = _DarknetConvBN(512, 256, 1)
        self.block4 = conv5(512 + 256, 256)
        self.head4_conv = _DarknetConvBN(256, 512, 3)
        self.head4_out = nn.Conv2d(512, no, 1, bias=True)
        self.lateral3 = _DarknetConvBN(256, 128, 1)
        self.block3 = conv5(256 + 128, 128)
        self.head3_conv = _DarknetConvBN(128, 256, 3)
        self.head3_out = nn.Conv2d(256, no, 1, bias=True)

    def forward(self, c3, c4, c5):
        x = c5
        for m in self.block5:
            x = m(x)
        x5 = x
        out5 = self.head5_out(self.head5_conv(x5))
        up = F.interpolate(self.lateral4(x5), scale_factor=2, mode="nearest")
        x = torch.cat([up, c4], dim=1)
        for m in self.block4:
            x = m(x)
        x4 = x
        out4 = self.head4_out(self.head4_conv(x4))
        up = F.interpolate(self.lateral3(x4), scale_factor=2, mode="nearest")
        x = torch.cat([up, c3], dim=1)
        for m in self.block3:
            x = m(x)
        out3 = self.head3_out(self.head3_conv(x))
        return out5, out4, out3

    def binary_chunks(self):
        """cfg order: per branch 5 block convs, head conv, head out
        (bias conv: [b, w]), then the next branch's lateral."""
        chunks = []
        for block, hconv, hout, lateral in (
                (self.block5, self.head5_conv, self.head5_out, self.lateral4),
                (self.block4, self.head4_conv, self.head4_out, self.lateral3),
                (self.block3, self.head3_conv, self.head3_out, None)):
            for m in block:
                chunks.extend(m.binary_chunks())
            chunks.extend(hconv.binary_chunks())
            chunks.append(hout.bias.detach().numpy())
            chunks.append(hout.weight.detach().numpy().ravel())
            if lateral is not None:
                chunks.extend(lateral.binary_chunks())
        return chunks


def test_yolov3_full_matches_torch_via_weights_file(tmp_path):
    """Flagship-path parity: a randomized torch Darknet-53 + YOLOv3
    neck/heads serialized into an actual darknet .weights FILE (header
    + stream), loaded with load_darknet_weights (the official-weights
    import), must reproduce the torch raw head maps elementwise —
    locks the whole cfg-order conv sequence, the neck concat order
    ([upsample, C4]), and the bias-conv stream convention."""
    from mydetection_tpu.models import darknet, yolov3
    from mydetection_tpu.weight_import import load_darknet_weights

    nc = 7
    rng = _seed_all(6)
    trunk = _TorchDarknet53().eval()
    neck = _TorchYoloNeck(nc).eval()
    for net in (trunk, neck):
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                _randomize_bn(m, rng)

    chunks = []
    for block in trunk.seq:
        chunks.extend(block.binary_chunks())
    chunks.extend(neck.binary_chunks())
    stream = np.concatenate([np.asarray(c, np.float32).ravel()
                             for c in chunks])
    path = str(tmp_path / "full.weights")
    with open(path, "wb") as fh:
        fh.write(np.asarray([0, 2, 0], np.int32).tobytes())
        fh.write(np.asarray([0], np.int64).tobytes())
        stream.tofile(fh)

    params = {"backbone": darknet.init(jax.random.PRNGKey(0)),
              "head": yolov3.init(jax.random.PRNGKey(1), nc)}
    params = load_darknet_weights(params, path)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    x = rng.randn(1, 64, 64, 3).astype(np.float32)

    def fwd(p, v):
        feats, _ = darknet.apply(p["backbone"], v)
        outs, _ = yolov3.apply(p["head"], feats)
        return outs

    outs = jax.jit(fwd)(params, jnp.asarray(x))
    with torch.no_grad():
        tc3, tc4, tc5 = trunk(torch.tensor(x).permute(0, 3, 1, 2))
        refs = neck(tc3, tc4, tc5)
    for got, ref, name in zip(outs, refs, ("P5", "P4", "P3")):
        want = ref.permute(0, 2, 3, 1).numpy()
        assert got.shape == want.shape, (name, got.shape, want.shape)
        _rel_close(np.asarray(got), want, 2e-4)


def test_rapid_full_matches_torch_via_weights_file(tmp_path):
    """RAPiD shares the YOLOv3 neck with 6 channels/anchor (x,y,w,h,θ,
    conf) — 3·(5+1) wide, so the nc=1 torch mirror is architecturally
    identical. Raw head maps through a real .weights file must match,
    and the rotated decode of those maps must be well-formed."""
    from mydetection_tpu.models import darknet, rapid, yolov3
    from mydetection_tpu.weight_import import load_darknet_weights

    rng = _seed_all(8)
    trunk = _TorchDarknet53().eval()
    neck = _TorchYoloNeck(num_classes=1).eval()  # 3*(5+1) = 18 = 3*6 ch
    for net in (trunk, neck):
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                _randomize_bn(m, rng)

    chunks = []
    for block in trunk.seq:
        chunks.extend(block.binary_chunks())
    chunks.extend(neck.binary_chunks())
    stream = np.concatenate([np.asarray(c, np.float32).ravel()
                             for c in chunks])
    path = str(tmp_path / "rapid.weights")
    with open(path, "wb") as fh:
        fh.write(np.asarray([0, 2, 0], np.int32).tobytes())
        fh.write(np.asarray([0], np.int64).tobytes())
        stream.tofile(fh)

    params = {
        "backbone": darknet.init(jax.random.PRNGKey(0)),
        "head": yolov3.init(jax.random.PRNGKey(1), 1,
                            channels_per_anchor=rapid.CHANNELS_PER_ANCHOR),
    }
    params = load_darknet_weights(params, path)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    x = rng.randn(1, 64, 64, 3).astype(np.float32)

    def fwd(p, v):
        feats, _ = darknet.apply(p["backbone"], v)
        outs, _ = yolov3.apply(p["head"], feats)
        return outs

    outs = jax.jit(fwd)(params, jnp.asarray(x))
    with torch.no_grad():
        tc3, tc4, tc5 = trunk(torch.tensor(x).permute(0, 3, 1, 2))
        refs = neck(tc3, tc4, tc5)
    for got, ref, name in zip(outs, refs, ("P5", "P4", "P3")):
        want = ref.permute(0, 2, 3, 1).numpy()
        assert got.shape == want.shape, (name, got.shape, want.shape)
        _rel_close(np.asarray(got), want, 2e-4)

    dec = rapid.decode(outs)
    theta = np.asarray(dec["boxes5"])[..., 4]
    assert (np.abs(theta) <= np.pi / 2 + 1e-6).all()
    conf = np.asarray(dec["conf"])
    assert ((conf >= 0) & (conf <= 1)).all()
