"""RetinaNet dense-assembly experiments: can the (B, N, C) concat go?

The @608 batch-32 XPlane profile shows ~2.05 ms for the
bf16[32,69354,80] class-logits concatenate plus ~5 ms of
data-formatting relayouts (the (B,H,W,A·C) → (B,HWA,C) reshapes
feeding it) inside "heads+decode". The postprocess only ever reads
back pre_nms=1024 rows per image from that tensor (stage-2 gather), so
in principle the concat never needs to materialize: keep the per-level
conv-native tensors, run the stage-1 gate top-k over the (cheap,
per-level-computed) gate vector, and gather each selected row from its
OWN level with offset arithmetic + validity masking.

The risk is the gather: XLA:TPU lowers row gathers as serialized
dynamic slices (the round-3 loss-gather lesson), and the per-level
variant does 5 of them at (1024, A·C) granularity plus an anchor
select. This harness measures both assemblies end-to-end (stage-1
top-k + stage-2 pair top-k inputs) so the answer is empirical.

RESULT — recorded NEGATIVE (v5e, batch 32 @608): concat 34.66 ms vs
per-level 37.59 ms on identical selection semantics (checksums match).
The five per-level (1024, A·C) row gathers + anchor one-hot selects
cost more than the single (B, N, C) concat+relayout they avoid —
consistent with the round-3 loss-gather lesson (XLA:TPU serializes
row gathers). The production concat assembly stays.

Run (TPU): python benchmarks/retinanet_assembly_experiments.py
Appends one JSON line to retinanet_assembly_experiments.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

A = 9  # anchors per cell
C = 80
PRE_NMS = 1024


def level_shapes(size):
    import math

    return [(math.ceil(size / s),) * 2 for s in (8, 16, 32, 64, 128)]


def make_levels(size, batch, dtype):
    import jax
    import jax.numpy as jnp

    # generated on device (host-staging (32,76,76,720) trips the
    # transport body limit)
    keys = jax.random.split(jax.random.PRNGKey(0), len(level_shapes(size)))
    outs = []
    for k, (h, w) in zip(keys, level_shapes(size)):
        outs.append(jax.jit(lambda kk, h=h, w=w: jax.random.normal(
            kk, (batch, h, w, A * C), jnp.float32).astype(dtype))(k))
    return outs


def assemble_concat(levels):
    """Production path: reshape + concat + per-level gate reduce."""
    import jax.numpy as jnp

    cls_flat, gate_flat = [], []
    for lv in levels:
        b, h, w, _ = lv.shape
        cl = lv.reshape(b, h * w * A, C)
        cls_flat.append(cl)
        gate_flat.append(jnp.max(cl, axis=-1))
    return jnp.concatenate(cls_flat, 1), jnp.concatenate(gate_flat, 1)


def post_concat(levels, conf):
    import jax
    import jax.numpy as jnp

    logits, gate = assemble_concat(levels)

    def one(lg, gt):
        _, sel = jax.lax.top_k(gt.astype(jnp.float32), PRE_NMS)
        rows = lg[sel].astype(jnp.float32)          # (K, C) gather
        return jnp.sum(jax.nn.sigmoid(rows))

    return jnp.sum(jax.vmap(one)(logits, gate))


def post_perlevel(levels, conf):
    """No (B, N, C) concat: per-level gate reduce (native layout) →
    global top-k over the concatenated (small) gates → per-level row
    gathers with offset arithmetic + anchor one-hot select."""
    import jax
    import jax.numpy as jnp

    gates, offs, hw_shapes = [], [], []
    off = 0
    for lv in levels:
        b, h, w, _ = lv.shape
        g = jnp.max(lv.reshape(b, h, w, A, C), axis=-1)   # (B,H,W,A)
        gates.append(g.reshape(b, h * w * A))
        offs.append(off)
        hw_shapes.append((h, w))
        off += h * w * A
    gate = jnp.concatenate(gates, 1)                      # (B, N) small

    def one(args):
        gt, per_level = args[0], args[1:]
        _, sel = jax.lax.top_k(gt.astype(jnp.float32), PRE_NMS)  # (K,)
        acc = jnp.zeros((PRE_NMS, C), jnp.float32)
        for lv2, off_l, (h, w) in zip(per_level, offs, hw_shapes):
            local = sel - off_l
            n_l = h * w * A
            valid = (local >= 0) & (local < n_l)
            lc = jnp.clip(local, 0, n_l - 1)
            hw_idx = lc // A                                # (K,)
            a_idx = lc % A                                  # (K,)
            rows = lv2.reshape(h * w, A * C)[hw_idx]        # (K, A*C)
            rows = rows.reshape(PRE_NMS, A, C).astype(jnp.float32)
            onehot = jax.nn.one_hot(a_idx, A, dtype=jnp.float32)
            picked = jnp.einsum("ka,kac->kc", onehot, rows)
            acc = acc + jnp.where(valid[:, None], picked, 0.0)
        return jnp.sum(jax.nn.sigmoid(acc))

    return jnp.sum(jax.vmap(lambda *a: one(a))(gate, *levels))


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    res = {"backend": backend, "batch": 32, "size": 608}
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    batch = 32 if backend == "tpu" else 2
    size = 608 if backend == "tpu" else 128
    res.update({"batch": batch, "size": size})
    levels = make_levels(size, batch, dtype)

    # correctness cross-check: both assemblies must select/sum the same
    # rows (identical gather semantics) — compare in f32
    f32_levels = [lv.astype(jnp.float32) for lv in levels]
    a = float(jax.jit(lambda ls: post_concat(ls, 0.05))(f32_levels))
    b = float(jax.jit(lambda ls: post_perlevel(ls, 0.05))(f32_levels))
    res["sum_concat"] = a
    res["sum_perlevel"] = b
    res["match"] = bool(abs(a - b) <= 1e-3 * max(abs(a), 1.0))
    print(f"# checksum concat {a:.4f} perlevel {b:.4f} match {res['match']}")

    if backend == "tpu":
        def timeit(fn, iters=30):
            j = jax.jit(fn)
            float(j(levels))
            float(j(levels))
            t0 = time.perf_counter()
            acc = 0.0
            for _ in range(iters):
                acc += float(j(levels))
            assert np.isfinite(acc)
            return round((time.perf_counter() - t0) / iters * 1e3, 3)

        res["concat_ms"] = timeit(lambda ls: post_concat(ls, 0.05))
        res["perlevel_ms"] = timeit(lambda ls: post_perlevel(ls, 0.05))
        print(f"# concat {res['concat_ms']} ms  perlevel "
              f"{res['perlevel_ms']} ms")
    print(json.dumps(res))
    with open(os.path.join(HERE,
                           "retinanet_assembly_experiments.json"), "a") as fh:
        fh.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
