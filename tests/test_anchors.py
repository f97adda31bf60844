"""Anchor k-means tool (SURVEY.md §2.7b; VERDICT r2 #7): planted
cluster recovery, table grouping, and the registry anchors override."""

import numpy as np
import pytest

from mydetection_tpu.anchors import (
    anchor_table,
    collect_wh,
    iou_wh,
    kmeans_anchors,
    mean_best_iou,
)


def _planted(rng, centers, n_per=80, jitter=0.03):
    """Tight clusters around planted (w, h) centers."""
    out = []
    for (w, h) in centers:
        out.append(np.stack([
            w * (1 + rng.uniform(-jitter, jitter, n_per)),
            h * (1 + rng.uniform(-jitter, jitter, n_per))], 1))
    return np.concatenate(out)


PLANTED = [(12, 24), (30, 30), (24, 60), (60, 50), (50, 110),
           (110, 100), (100, 210), (220, 190), (190, 370)]


def test_kmeans_recovers_planted_centers():
    rng = np.random.RandomState(0)
    wh = _planted(rng, PLANTED)
    cents = kmeans_anchors(wh, k=9, seed=0)
    # every planted center has a recovered centroid with IoU > 0.9
    best = np.max(iou_wh(np.asarray(PLANTED, np.float64), cents), axis=1)
    assert (best > 0.9).all(), best
    assert mean_best_iou(wh, cents) > 0.9
    # deterministic for a fixed seed
    np.testing.assert_array_equal(cents, kmeans_anchors(wh, k=9, seed=0))


def test_anchor_table_grouping_matches_family_layout():
    rng = np.random.RandomState(1)
    wh = _planted(rng, PLANTED)
    table = anchor_table(wh)
    assert len(table) == 3 and all(len(lvl) == 3 for lvl in table)
    # P5 (first level) holds the LARGEST anchors, P3 the smallest —
    # the models.yolov3.ANCHORS / models.rapid.ANCHORS convention
    areas = [[w * h for w, h in lvl] for lvl in table]
    assert min(areas[0]) >= max(areas[1]) >= 0
    assert min(areas[1]) >= max(areas[2]) >= 0
    # within a level, ascending area (matches the canonical table's
    # smallest-to-largest reading order after the level split)
    flat = [a for lvl in reversed(areas) for a in lvl]
    assert flat == sorted(flat)


def test_kmeans_input_validation():
    with pytest.raises(ValueError, match="at least k"):
        kmeans_anchors(np.ones((5, 2)), k=9)
    bad = np.ones((20, 2))
    bad[3, 0] = -1
    with pytest.raises(ValueError, match="positive"):
        kmeans_anchors(bad, k=4)


def test_collect_wh_and_registry_override():
    class FakeDs:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                return {"boxes": np.zeros((0, 5), np.float32)}
            return {"boxes": np.asarray(
                [[50, 50, 10 * (i + 1), 20 * (i + 1), 0.1]], np.float32)}

    wh = collect_wh(FakeDs())
    assert wh.shape == (3, 2)
    np.testing.assert_allclose(wh[0], [10, 20])

    # registry override reaches the decode: raw zeros decode to exactly
    # the anchor (w, h) (sigmoid(0) center, exp(0)·anchor size)
    import jax.numpy as jnp

    from mydetection_tpu.models import rapid

    custom = (((200.0, 400.0), (250.0, 300.0), (380.0, 190.0)),
              ((90.0, 180.0), (120.0, 150.0), (180.0, 90.0)),
              ((40.0, 90.0), (60.0, 75.0), (90.0, 45.0)))
    raws = [jnp.zeros((1, s, s, 3 * rapid.CHANNELS_PER_ANCHOR), jnp.float32)
            for s in (2, 4, 8)]
    decoded = rapid.decode(raws, anchors=custom)
    wh03 = np.asarray(decoded["boxes5"])[0, :3, 2:4]
    np.testing.assert_allclose(wh03, np.asarray(custom[0]), rtol=1e-5)

    from mydetection_tpu.registry import get_model

    model = get_model("rapid", input_size=64, anchors=custom)
    assert model.config.anchors == custom


def test_registry_rejects_malformed_anchor_tables():
    import pytest

    from mydetection_tpu.registry import get_model

    bad_4_per_level = tuple(
        tuple((10.0 * (i + 1), 12.0 * (i + 1)) for i in range(4))
        for _ in range(3))
    with pytest.raises(ValueError, match="3 levels"):
        get_model("yolov3", anchors=bad_4_per_level)
    with pytest.raises(ValueError, match="darknet families"):
        get_model("retinanet", anchors=((10.0, 10.0),) * 3)
    good = tuple(tuple((10.0 + i + j, 12.0 + i + j) for j in range(3))
                 for i in range(3))
    get_model("rapid", anchors=good)  # consumable table builds fine
