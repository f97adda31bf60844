"""RetinaNet head MFU experiments (VERDICT r3 weak #1 / next #4).

The @608 batch-32 profile puts heads+decode at ~22.4 ms of a ~57 ms
batch (benchmarks/profile_resnet.json) while the tower FLOPs
(2 towers x 4 convs x 256ch + out convs over 7706 cells) price out at
~8.1 ms @100% bf16 MFU — so the head runs at ~36% while the ResNet
stages 2-4 hit 90%+. Hypothesis: the per-level dispatch of the shared
towers wastes MXU on the tiny levels (P5 19x19, P6 10x10, P7 5x5 —
6.3% of cells but 3 of 5 conv calls per layer).

Experiment: PACK the small levels into one canvas along W with 1-col
zero gaps (and zero H-padding for the shorter levels), run the towers
once over {P3, P4, packed}, and re-zero the gap/pad cells after every
conv+bias+ReLU so each level sees exactly the zero boundary it would
have seen standalone — bit-identical outputs, verified here before
timing. 3 conv dispatches per tower layer instead of 5; packed-canvas
overhead 19x36=684 cells vs 486 useful (1.41x on 6.3% of the FLOPs).

Run on TPU: python benchmarks/retinanet_head_experiments.py
Appends results to benchmarks/retinanet_head_experiments.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def pack_levels(feats, gap: int = 1):
    """Concat levels along W with `gap` zero columns; pad H to the
    tallest. Returns (packed (B, H0, Wp, C), per-level (h, w, col0))."""
    import jax.numpy as jnp

    h0 = feats[0].shape[1]
    parts, geo, col = [], [], 0
    for i, f in enumerate(feats):
        b, h, w, c = f.shape
        if i:
            parts.append(jnp.zeros((b, h0, gap, c), f.dtype))
            col += gap
        parts.append(jnp.pad(f, ((0, 0), (0, h0 - h), (0, 0), (0, 0))))
        geo.append((h, w, col))
        col += w
    return jnp.concatenate(parts, axis=2), geo


def pack_mask(geo, h0: int, wp: int):
    """(1, H0, Wp, 1) float mask: 1 on valid cells, 0 on gaps/pads."""
    m = np.zeros((1, h0, wp, 1), np.float32)
    for h, w, c0 in geo:
        m[0, :h, c0:c0 + w] = 1.0
    return m


def _subnet_perlevel(p, feats, *, compute_dtype):
    from mydetection_tpu.models.retinanet import _subnet

    return [_subnet(p, f, compute_dtype=compute_dtype) for f in feats]


def _subnet_packed(p, packed, mask, *, compute_dtype):
    """The shared subnet over a packed canvas. The mask multiply after
    each conv+bias+ReLU restores the zero boundary (bias leaks into
    gap/pad cells otherwise and the NEXT conv would read it)."""
    import jax.numpy as jnp

    from mydetection_tpu.models.layers import conv2d

    x = packed
    m = mask.astype(compute_dtype if compute_dtype is not None else x.dtype)
    for i in range(4):
        w = p[f"conv{i}"]
        x = conv2d(x, w["w"], compute_dtype=compute_dtype) + w["b"].astype(
            x.dtype if compute_dtype is None else compute_dtype)
        x = jnp.maximum(x, 0.0) * m
    y = conv2d(x, p["out"]["w"], compute_dtype=compute_dtype)
    return y + p["out"]["b"].astype(y.dtype)


def unpack_levels(y, geo):
    return [y[:, :h, c0:c0 + w] for h, w, c0 in geo]


def make_pyramid(rng, batch, size, channels=256, dtype=np.float32):
    import jax.numpy as jnp

    from mydetection_tpu.models.retinanet import level_shapes

    return [jnp.asarray(rng.randn(batch, h, w, channels).astype(dtype))
            for h, w in level_shapes(size)]


def check_exact(size: int = 160) -> bool:
    """Packed == per-level, bit-for-bit in f32 (run on any backend)."""
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models import retinanet

    rng = np.random.RandomState(0)
    params = retinanet.init(jax.random.PRNGKey(0), num_classes=8)
    feats = make_pyramid(rng, 2, size)
    split = 2  # pack P5..P7

    @jax.jit
    def both(p, feats):
        base = _subnet_perlevel(p["cls"], feats, compute_dtype=jnp.float32)
        packed, geo = pack_levels(feats[split:])
        m = jnp.asarray(pack_mask(geo, packed.shape[1], packed.shape[2]))
        yp = _subnet_packed(p["cls"], packed, m, compute_dtype=jnp.float32)
        return base[split:], unpack_levels(yp, geo)

    with jax.default_matmul_precision("highest"):
        base, packed = both(params, feats)
    ok = True
    for b, q in zip(base, packed):
        same = bool(jnp.all(b == q))
        print(f"  level {b.shape[1]}x{b.shape[2]}: bitwise equal = {same}")
        ok &= same
    return ok


def bench(size: int = 608, batch: int = 32, iters: int = 30) -> dict:
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models import retinanet

    dtype = jnp.bfloat16
    params = retinanet.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    feats = make_pyramid(rng, batch, size, dtype=np.float32)
    feats = [f.astype(dtype) for f in feats]

    def heads_perlevel(p, feats):
        out = 0.0
        for tower in ("cls", "box"):
            for y in _subnet_perlevel(p[tower], feats, compute_dtype=dtype):
                out += jnp.sum(y.astype(jnp.float32))
        return out

    def heads_packed(p, feats, split):
        packed, geo = pack_levels(feats[split:])
        m = jnp.asarray(pack_mask(geo, packed.shape[1], packed.shape[2]))
        out = 0.0
        for tower in ("cls", "box"):
            for y in _subnet_perlevel(p[tower], feats[:split],
                                      compute_dtype=dtype):
                out += jnp.sum(y.astype(jnp.float32))
            yp = _subnet_packed(p[tower], packed, m, compute_dtype=dtype)
            for y in unpack_levels(yp, geo):
                out += jnp.sum(y.astype(jnp.float32))
        return out

    def timeit(fn, *args):
        j = jax.jit(fn)
        float(j(*args))
        float(j(*args))
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(iters):
            acc += float(j(*args))
        dt = (time.perf_counter() - t0) / iters * 1e3
        assert np.isfinite(acc)
        return dt

    rows = {"perlevel_ms": timeit(heads_perlevel, params, feats)}
    for split in (1, 2, 3):
        rows[f"packed_from_P{3 + split}_ms"] = timeit(
            functools.partial(heads_packed, split=split), params, feats)
    return rows


def main():
    import jax

    print("# exactness (f32, HIGHEST):")
    ok = check_exact()
    res = {"backend": jax.default_backend(), "exact": ok}
    if jax.default_backend() == "tpu":
        res.update(bench())
    print(json.dumps(res, indent=2))
    with open(os.path.join(HERE, "retinanet_head_experiments.json"),
              "a") as fh:
        fh.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
