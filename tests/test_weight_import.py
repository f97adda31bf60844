"""Weight importer tests: darknet binary round-trip, torchvision
ResNet state-dict mapping, per-layer activation parity
(SURVEY.md §7 hard-part #3: silent-mAP-killers get direct tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mydetection_tpu.registry import get_model
from mydetection_tpu.weight_import import (
    import_resnet_state_dict,
    import_state_dict,
    jax_to_numpy,
    load_darknet_weights,
    save_darknet_weights,
)


def tree_allclose(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_darknet_roundtrip(tmp_path):
    model = get_model("yolov3")
    rng = jax.random.PRNGKey(3)
    params = model.init(rng)
    # randomize BN stats so the round-trip is non-trivial
    params = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jax.random.normal(rng, x.shape, jnp.float32), params)
    path = str(tmp_path / "w.weights")
    save_darknet_weights(params, path)
    model2 = get_model("yolov3")
    fresh = model2.init(jax.random.PRNGKey(9))
    loaded = load_darknet_weights(fresh, path)
    tree_allclose(jax_to_numpy(params), loaded)


def test_darknet_length_mismatch(tmp_path):
    model = get_model("yolov3")
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "w.weights")
    save_darknet_weights(params, path)
    with open(path, "ab") as fh:  # extra trailing floats must be rejected
        np.zeros(7, np.float32).tofile(fh)
    with pytest.raises(ValueError, match="length mismatch"):
        load_darknet_weights(params, path)


def test_darknet_oihw_transpose_semantics(tmp_path):
    """A known conv weight survives the OIHW<->HWIO round trip with the
    exact element placement darknet uses."""
    model = get_model("yolov3")
    params = model.init(jax.random.PRNGKey(0))
    w = np.zeros((3, 3, 3, 32), np.float32)  # stem HWIO
    w[1, 2, 0, 5] = 7.25  # h=1, w=2, in=0, out=5
    params["backbone"]["stem"]["conv"]["w"] = jnp.asarray(w)
    path = str(tmp_path / "w.weights")
    save_darknet_weights(params, path)
    # manually locate the element in the raw stream: stem is the first
    # conv; after 4*32 BN floats, weights are OIHW: idx = ((5*3+0)*3+1)*3+2
    raw = np.fromfile(path, np.float32, offset=4 * 3 + 8)
    idx = 4 * 32 + ((5 * 3 + 0) * 3 + 1) * 3 + 2
    assert raw[idx] == 7.25
    loaded = load_darknet_weights(params, path)
    assert loaded["backbone"]["stem"]["conv"]["w"][1, 2, 0, 5] == 7.25


def _fake_torch_resnet_state(params):
    """Build a torchvision-style state dict matching our resnet-50 tree."""
    rng = np.random.RandomState(0)
    state = {}

    def fake_conv_bn(node, conv_key, bn_key):
        kh, kw, ci, co = node["conv"]["w"].shape
        state[conv_key + ".weight"] = rng.randn(co, ci, kh, kw).astype(np.float32)
        for name, suffix in (("weight", "scale"), ("bias", "bias")):
            state[bn_key + "." + name] = rng.randn(co).astype(np.float32)
        state[bn_key + ".running_mean"] = rng.randn(co).astype(np.float32)
        state[bn_key + ".running_var"] = np.abs(rng.randn(co)).astype(np.float32)

    fake_conv_bn(params["stem"], "conv1", "bn1")
    for si in range(4):
        stage = params[f"stage{si}"]
        bi = 0
        while f"block{bi}" in stage:
            p = f"layer{si + 1}.{bi}"
            blk = stage[f"block{bi}"]
            for ci in (1, 2, 3):
                fake_conv_bn(blk[f"conv{ci}"], f"{p}.conv{ci}", f"{p}.bn{ci}")
            if "down" in blk:
                fake_conv_bn(blk["down"], f"{p}.downsample.0", f"{p}.downsample.1")
            bi += 1
    return state


def test_resnet_state_dict_import():
    from mydetection_tpu.models import resnet

    params = resnet.init(jax.random.PRNGKey(0), depth=50)
    state = _fake_torch_resnet_state(jax_to_numpy(params))
    loaded = import_resnet_state_dict(params, state)
    # spot checks: transpose + bn fields land in the right leaves
    np.testing.assert_allclose(
        loaded["stem"]["conv"]["w"],
        np.transpose(state["conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(loaded["stage2"]["block3"]["conv2"]["bn"]["var"],
                               state["layer3.3.bn2.running_var"])
    np.testing.assert_allclose(
        loaded["stage0"]["block0"]["down"]["conv"]["w"],
        np.transpose(state["layer1.0.downsample.0.weight"], (2, 3, 1, 0)))


def test_generic_mapping_import():
    model = get_model("yolov3")
    params = model.init(jax.random.PRNGKey(0))
    w = np.random.RandomState(0).randn(32, 3, 3, 3).astype(np.float32)  # OIHW
    b = np.random.RandomState(1).randn(32).astype(np.float32)
    state = {"backbone.stem.conv.weight": w, "backbone.stem.bn.bias": b,
             "unused.key": np.zeros(1, np.float32)}
    mapping = {
        "backbone/stem/conv/w": "backbone.stem.conv.weight",
        "backbone/stem/bn/bias": "backbone.stem.bn.bias",
    }
    loaded, unmapped = import_state_dict(params, state, mapping)
    np.testing.assert_allclose(loaded["backbone"]["stem"]["conv"]["w"],
                               np.transpose(w, (2, 3, 1, 0)))
    np.testing.assert_allclose(loaded["backbone"]["stem"]["bn"]["bias"], b)
    assert unmapped == ["unused.key"]


def test_imported_weights_change_activations():
    """Per-layer parity guard: importing different weights must change
    the forward output (catches silently-ignored imports)."""
    model = get_model("yolov3", input_size=64, compute_dtype=jnp.float32)
    p1 = model.init(jax.random.PRNGKey(0))
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "w.weights")
        save_darknet_weights(model.init(jax.random.PRNGKey(42)), path)
        p2 = load_darknet_weights(p1, path)
    # random (not zero) input: conv(0) = 0 for ANY weights, so a zero
    # image cannot distinguish weight sets
    x = jnp.asarray(np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3),
                                                     np.uint8))
    f = jax.jit(lambda p: model.forward_dense(p, x)[0]["scores"])
    s1, s2 = f(p1), f(jax.tree_util.tree_map(jnp.asarray, p2))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def _fake_fpn_state(fpn_params, rng, *, new_style=True):
    """torchvision BackboneWithFPN-style fpn keys (backbone.fpn.*)."""
    state = {}
    mid = ".0" if new_style else ""
    for i, lvl in enumerate((3, 4, 5)):
        for tv, ours in ((f"inner_blocks.{i}", f"lateral{lvl}"),
                         (f"layer_blocks.{i}", f"smooth{lvl}")):
            kh, kw, ci, co = fpn_params[ours]["w"].shape
            state[f"backbone.fpn.{tv}{mid}.weight"] = rng.randn(
                co, ci, kh, kw).astype(np.float32)
            state[f"backbone.fpn.{tv}{mid}.bias"] = rng.randn(co).astype(np.float32)
    for p in ("p6", "p7"):
        kh, kw, ci, co = fpn_params[p]["w"].shape
        state[f"backbone.fpn.extra_blocks.{p}.weight"] = rng.randn(
            co, ci, kh, kw).astype(np.float32)
        state[f"backbone.fpn.extra_blocks.{p}.bias"] = rng.randn(co).astype(np.float32)
    return state


def _conv_entry(rng, node, key):
    kh, kw, ci, co = node["w"].shape
    return {f"{key}.weight": rng.randn(co, ci, kh, kw).astype(np.float32),
            f"{key}.bias": rng.randn(co).astype(np.float32)}


def test_retinanet_state_dict_import():
    from mydetection_tpu.weight_import import import_retinanet_state_dict

    model = get_model("retinanet", input_size=128)
    params = jax_to_numpy(model.init(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(7)
    state = {"backbone.body." + k: v for k, v in
             _fake_torch_resnet_state(params["backbone"]).items()}
    state.update(_fake_fpn_state(params["fpn"], rng))
    for our, tv in (("cls", "classification_head"), ("box", "regression_head")):
        for i in range(4):
            state.update(_conv_entry(rng, params["head"][our][f"conv{i}"],
                                     f"head.{tv}.conv.{i}.0"))
        final = "cls_logits" if our == "cls" else "bbox_reg"
        state.update(_conv_entry(rng, params["head"][our]["out"],
                                 f"head.{tv}.{final}"))
    loaded = import_retinanet_state_dict(params, state)
    np.testing.assert_allclose(
        loaded["fpn"]["lateral4"]["w"],
        np.transpose(state["backbone.fpn.inner_blocks.1.0.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        loaded["head"]["cls"]["out"]["b"],
        state["head.classification_head.cls_logits.bias"])
    np.testing.assert_allclose(
        loaded["head"]["box"]["conv2"]["w"],
        np.transpose(state["head.regression_head.conv.2.0.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        loaded["backbone"]["stem"]["bn"]["mean"],
        state["backbone.body.bn1.running_mean"])
    # old-style flat-Sequential head names (torchvision < 0.12) also import
    state_old = {}
    for k, v in state.items():
        k2 = k
        for i in range(4):
            k2 = k2.replace(f".conv.{i}.0.", f".conv.{2 * i}.")
        k2 = k2.replace("inner_blocks.0.0.", "inner_blocks.0.").replace(
            "inner_blocks.1.0.", "inner_blocks.1.").replace(
            "inner_blocks.2.0.", "inner_blocks.2.").replace(
            "layer_blocks.0.0.", "layer_blocks.0.").replace(
            "layer_blocks.1.0.", "layer_blocks.1.").replace(
            "layer_blocks.2.0.", "layer_blocks.2.")
        state_old[k2] = v
    loaded_old = import_retinanet_state_dict(params, state_old)
    tree_allclose(loaded, loaded_old)


def test_fcos_state_dict_import():
    from mydetection_tpu.weight_import import import_fcos_state_dict

    model = get_model("fcos", input_size=128)
    params = jax_to_numpy(model.init(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(11)
    state = {"backbone.body." + k: v for k, v in
             _fake_torch_resnet_state(params["backbone"]).items()}
    state.update(_fake_fpn_state(params["fpn"], rng))
    for tower, tv in (("cls_tower", "classification_head"),
                      ("box_tower", "regression_head")):
        for i in range(4):
            state.update(_conv_entry(rng, params["head"][tower][f"conv{i}"],
                                     f"head.{tv}.conv.{i}.0"))
            c = params["head"][tower][f"gn{i}"]["scale"].shape[0]
            state[f"head.{tv}.conv.{i}.1.weight"] = rng.randn(c).astype(np.float32)
            state[f"head.{tv}.conv.{i}.1.bias"] = rng.randn(c).astype(np.float32)
    state.update(_conv_entry(rng, params["head"]["cls_out"],
                             "head.classification_head.cls_logits"))
    state.update(_conv_entry(rng, params["head"]["box_out"],
                             "head.regression_head.bbox_reg"))
    state.update(_conv_entry(rng, params["head"]["ctr_out"],
                             "head.regression_head.bbox_ctrness"))
    loaded = import_fcos_state_dict(params, state)
    np.testing.assert_allclose(
        loaded["head"]["cls_tower"]["gn3"]["scale"],
        state["head.classification_head.conv.3.1.weight"])
    np.testing.assert_allclose(
        loaded["head"]["ctr_out"]["b"],
        state["head.regression_head.bbox_ctrness.bias"])
    np.testing.assert_allclose(
        loaded["head"]["box_tower"]["conv0"]["w"],
        np.transpose(state["head.regression_head.conv.0.0.weight"], (2, 3, 1, 0)))
    # per-level scales have no torchvision counterpart: untouched
    np.testing.assert_allclose(loaded["head"]["scales"],
                               params["head"]["scales"])


def test_retinanet_anchor_order():
    """The anchor table's flatten order must equal the head reshape's:
    level-major, row-major cells, anchors fastest — with the 9 shapes
    ratio-major/scale-minor exactly as torchvision's AnchorGenerator
    emits them (w_ratios[:,None]*scales[None,:]).view(-1)."""
    from mydetection_tpu.models import retinanet as rn

    anchors = np.asarray(rn.generate_anchors(128))
    shapes = rn.level_shapes(128)
    a = rn.NUM_ANCHORS
    # level-major offsets
    off = 0
    for stride, (h, w) in zip(rn.STRIDES, shapes):
        cell = anchors[off: off + h * w * a].reshape(h, w, a, 4)
        # anchor centers constant across the 9 shapes of one cell
        np.testing.assert_allclose(cell[1 % h, 2 % w, :, 0],
                                   (2 % w) * stride)
        # ratio-major/scale-minor with torchvision's int-truncated
        # sizes and rounded half-extents
        sizes = (4.0 * stride, float(int(4 * stride * 2 ** (1 / 3))),
                 float(int(4 * stride * 2 ** (2 / 3))))
        k = 0
        for ratio in rn.ASPECT_RATIOS:
            for size in sizes:
                wexp = 2.0 * round(size / np.sqrt(ratio) / 2.0)
                hexp = 2.0 * round(size * np.sqrt(ratio) / 2.0)
                np.testing.assert_allclose(cell[0, 0, k, 2], wexp)
                np.testing.assert_allclose(cell[0, 0, k, 3], hexp)
                k += 1
        off += h * w * a
    assert off == anchors.shape[0]


def test_darknet_backbone_only_roundtrip(tmp_path):
    """darknet53.conv.74-style files: backbone loads, head untouched,
    and a full yolov3.weights file is rejected with a readable error."""
    from mydetection_tpu.weight_import import load_darknet_backbone_weights

    model = get_model("yolov3")
    rng = jax.random.PRNGKey(5)
    src = model.init(rng)
    src = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jax.random.normal(rng, x.shape, jnp.float32), src)
    path = str(tmp_path / "darknet53.conv.74")
    save_darknet_weights(src, path, backbone_only=True)

    fresh = get_model("yolov3").init(jax.random.PRNGKey(11))
    loaded = load_darknet_backbone_weights(fresh, path)
    tree_allclose(jax_to_numpy(src)["backbone"], loaded["backbone"])
    # the head keeps its own init (not the donor's)
    tree_allclose(jax_to_numpy(fresh)["head"], loaded["head"])

    # the same file initializes a RAPiD tree (same Darknet-53 trunk)
    rapid = get_model("rapid").init(jax.random.PRNGKey(12))
    loaded_r = load_darknet_backbone_weights(rapid, path)
    tree_allclose(jax_to_numpy(src)["backbone"]["stem"],
                  loaded_r["backbone"]["stem"])

    # a FULL weights file through the backbone loader fails readably
    full = str(tmp_path / "full.weights")
    save_darknet_weights(src, full)
    with pytest.raises(ValueError, match="length mismatch"):
        load_darknet_backbone_weights(fresh, full)


def test_retinanet_v2_checkpoint_rejected():
    """torchvision retinanet v2 (GN-tower) state dicts fail loudly —
    importing the convs while dropping the GroupNorms would produce
    garbage activations with no diagnostic."""
    from mydetection_tpu.weight_import import import_retinanet_state_dict

    # the guard fires before any backbone work, so no params are needed
    state = {"head.classification_head.conv.0.0.weight": np.zeros((256, 256, 3, 3), np.float32),
             "head.classification_head.conv.0.1.weight": np.ones(256, np.float32)}
    with pytest.raises(ValueError, match="v2"):
        import_retinanet_state_dict({}, state)
