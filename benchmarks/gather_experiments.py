"""Streaming row-gather Pallas kernel vs XLA gather — experiment record.

Context (round 3): the multi-label postprocess (RetinaNet/FCOS,
ops/nms.py) gathers the stage-1-selected boxes' class-logit rows —
(pre_nms, C) out of the dense (N, C) head output. XLA's TPU gather
lowers this as a full-array scan-select running at ~200 GB/s: measured
~2.3 ms/batch-32 at RetinaNet-608 shapes (N=69,354, C=80) and FLAT in
the number of rows gathered (128 rows cost the same as 1024 — it
re-reads the whole logits tensor at a quarter of HBM roofline).

The kernel below streams the source once at full DMA bandwidth
instead: sorted row indices are scalar-prefetched to SMEM, the source
is blocked into (R, C) strips, and each grid step copies out only the
selected rows that land in its strip (`searchsorted`, computed in XLA
and also prefetched, gives each strip its [start, end) range of the
sorted index list), so total in-kernel copy work is exactly K rows.

MEASURED OUTCOME (v5e, batch 32, N=69,354, C=80, K=1000):

  * scan-protocol standalone (kernel body iterated inside one lax.scan
    dispatch, int32 operand pre-staged in kernel-friendly layout):
    0.356 ms vs XLA gather 2.33 ms — 6.5x, ~roofline. This is the
    number that motivated the integration attempt.
  * plain-loop standalone (this script, one dispatch per iteration,
    operand in XLA's natural layout): the win VANISHES — bf16 12.6 vs
    XLA 3.1 ms (the pair-bitcast materializes as a full de-tiling
    pass), f32 5.9 vs 4.9 ms. The scan-protocol win only exists when
    the operand layout is already custom-call-compatible.
  * in-graph (composed into the fused detect pipeline after the bf16
    head convs): the batched postprocess REGRESSES +9 ms; end-to-end
    RetinaNet@608 623 -> 476 img/s. Two costs appear around the
    custom call that do not exist in the scan-protocol measurement:
      - the bf16->int32 pair-bitcast workaround (Mosaic's (16,128)
        bf16 tiling rejects dynamic single-row vector loads; pairs
        bitcast to int32 use the supported (8,128) tiling) costs
        ~8 ms in-graph — XLA materializes it as a full de-tiling pass
        over the 354 MB operand instead of a free reinterpret;
      - even with an int32 source (no bitcast), the in-graph kernel
        costs ~12.5 ms: XLA inserts a layout copy of the whole dense
        operand to satisfy the Pallas custom call's default layout,
        because the surrounding conv graph holds the tensor in a
        layout the custom-call boundary cannot consume in place.
  * batched restructuring alone (one (B,N)-max + one batched top-k +
    XLA take_along_axis above the per-image vmap) measured ~neutral:
    6.8 vs 7.0 ms for the full postprocess.

CONCLUSION (seventh negative, README): the custom-call layout boundary
eats the streaming win; the production postprocess keeps XLA's gather.
Revisit only if Pallas grows layout-aware operands (or the head emits
f32 logits, removing the bitcast AND the layout mismatch).

Run: python benchmarks/gather_experiments.py  (TPU; CPU falls back to
interpret mode for correctness only).
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(sel_ref, starts_ref, src_ref, out_ref, *, rows: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    s = starts_ref[b, i]
    e = starts_ref[b, i + 1]

    def body(j, _):
        local = sel_ref[b, j] - i * rows
        out_ref[0, pl.ds(j, 1), :] = src_ref[0, pl.ds(local, 1), :]
        return 0

    jax.lax.fori_loop(s, e, body, 0, unroll=False)


def gather_rows_sorted(src: jnp.ndarray, sel: jnp.ndarray, *,
                       rows: int = 4096, interpret: bool = False
                       ) -> jnp.ndarray:
    """Batched row gather: (B, N, C) x (B, K) sorted int32 -> (B, K, C).

    Semantically identical to jnp.take_along_axis(src, sel[..., None],
    axis=1) for sorted `sel` (duplicates allowed); streams the source
    once instead of XLA's flat scan-select.
    """
    b, n, c = src.shape
    k = sel.shape[-1]
    nb = pl.cdiv(n, rows)
    sel = sel.astype(jnp.int32)
    # Mosaic's bf16 (16, 128) tiling rejects dynamic single-row slices;
    # reinterpret element pairs as int32 ((8, 128) tiling, supported)
    # and bitcast back after. Standalone this is free; in-graph it
    # materializes a de-tiling pass (see module docstring).
    if src.dtype == jnp.bfloat16:
        assert c % 2 == 0, "bf16 gather needs an even minor dim"
        packed = jax.lax.bitcast_convert_type(
            src.reshape(b, n, c // 2, 2), jnp.int32)
        out = gather_rows_sorted(packed, sel, rows=rows,
                                 interpret=interpret)
        return jax.lax.bitcast_convert_type(
            out, jnp.bfloat16).reshape(b, k, c)
    # strip s owns sorted sel positions [starts[s], starts[s+1])
    edges = jnp.arange(1, nb + 1, dtype=jnp.int32) * rows
    starts = jax.vmap(
        lambda s: jnp.searchsorted(s, edges, side="left").astype(jnp.int32)
    )(sel)
    starts = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), starts], axis=1)      # (B, nb+1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, rows, c), lambda bb, ii, *_: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, c), lambda bb, ii, *_: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, rows=rows),
        out_shape=jax.ShapeDtypeStruct((b, k, c), src.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(sel, starts, src)


def _timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    rng = np.random.RandomState(0)
    b, n, c, k = 32, 69354, 80, 1000
    if not on_tpu:  # correctness-scale shapes off-TPU
        b, n, c, k = 3, 3000, 80, 128
    src32 = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    src16 = src32.astype(jnp.bfloat16)
    sel = jnp.asarray(
        np.sort(rng.choice(n, (b, k), replace=False), axis=1).astype(np.int32))

    # correctness (both dtypes)
    for src in (src32, src16):
        got = gather_rows_sorted(src, sel, rows=1024, interpret=interpret)
        ref = jnp.take_along_axis(src, sel[..., None], axis=1)
        np.testing.assert_array_equal(
            np.asarray(got.astype(jnp.float32)),
            np.asarray(ref.astype(jnp.float32)))
    print("correctness ok (f32 + bf16 bitcast path)")

    results = {"backend": jax.default_backend(), "shape": [b, n, c, k]}
    if on_tpu:
        g = jax.jit(functools.partial(gather_rows_sorted, rows=4096))
        x = jax.jit(lambda s, i: jnp.take_along_axis(s, i[..., None], axis=1))
        results["xla_gather_bf16_ms"] = round(_timed(x, src16, sel), 3)
        results["pallas_standalone_bf16_ms"] = round(_timed(g, src16, sel), 3)
        results["xla_gather_f32_ms"] = round(_timed(x, src32, sel), 3)
        results["pallas_standalone_f32_ms"] = round(_timed(g, src32, sel), 3)

        # in-graph proxy: a bf16-producing op feeds the gather inside
        # ONE jitted graph — reproduces the layout-copy penalty.
        def in_graph(src, sel, w):
            y = (src * w).astype(jnp.bfloat16)
            return gather_rows_sorted(y, sel, rows=4096)

        def in_graph_xla(src, sel, w):
            y = (src * w).astype(jnp.bfloat16)
            return jnp.take_along_axis(y, sel[..., None], axis=1)

        w = jnp.float32(1.0001)
        results["ingraph_pallas_ms"] = round(
            _timed(jax.jit(in_graph), src32, sel, w), 3)
        results["ingraph_xla_ms"] = round(
            _timed(jax.jit(in_graph_xla), src32, sel, w), 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
