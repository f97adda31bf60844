"""Darknet-53 backbone in pure-functional JAX (NHWC).

Reference parity: `models/backbones/darknet.py` in
duanzhiihao/myDetection [recalled; SURVEY.md §2.3] — the 52-conv
residual backbone from the YOLOv3 paper (arXiv 1804.02767): a stem
conv then five stages of (stride-2 downsample conv + N residual
blocks) with N = 1/2/8/8/4. Each residual block is 1x1 (c→c/2) then
3x3 (c/2→c) with an additive skip. Returns C3/C4/C5 features at
strides 8/16/32.

TPU-native: NHWC activations, HWIO weights, optional bfloat16 compute;
the whole stack is one XLA graph under jit (no module framework).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mydetection_tpu.models.layers import (
    KeyGen,
    Params,
    batch_norm,
    conv2d,
    conv_bn_leaky,
    conv_bn_leaky_init,
    leaky_relu,
)

STAGE_BLOCKS = (1, 2, 8, 8, 4)
STAGE_CHANNELS = (64, 128, 256, 512, 1024)


# ---------------------------------------------------------------------------
# space-to-depth early stages (TPU fast path; exact rewrite)
# ---------------------------------------------------------------------------
#
# Profiled on v5e at batch 32/416²: the stem conv (3→32 @416²), the
# first downsample (32→64 @208²), stage0's residual block, and
# stage1's downsample run at 1.6-28% MFU — the 128-lane MXU/VPU pads
# C∈{3,32,64} channels 2-40×, and these layers burned 12.3 of the
# 22.2 ms batch-32 conv total while stages 2-4 run at 92-95%. The
# classic TPU detection fix: fold a 2×2 space-to-depth into the conv
# WEIGHTS so the same dot products run at half resolution with 4× the
# channels. Crucially the S2D relayout itself is NEVER materialized (a
# (H,W,3)→(H/2,W/2,12) transpose measured 2.8 ms alone — lane-minor
# C=3 relayouts are pathological): phase extraction is folded into a
# single 4×4 stride-2 conv on the ORIGINAL layout whose 128 output
# channels are the four phases of the 32-channel stem activation.
# Bit-identical math up to float reassociation; gated to inference
# (BN batch-stats would otherwise reduce over phase-split channels).
#
# Domain plan (cells = half-resolution positions, channels phase-major
# (pi·2+pj)·C+c for output pixel (2I+pi, 2J+pj)):
#   x (H,W,3) ──conv 4×4 s2 (3→4·32), pad (1,1)──▶ S2D stem act (H/2, 4·32)
#     ──conv 3×3 s2 (4·32→4·64), pad (1,0)──▶ S2D s0.down act (H/4, 4·64)
#     ── s0 res block, phase-inflated weights ──▶ same domain
#     ──conv 2×2 s1 (4·64→128), pad (1,0)──▶ ORIGINAL s1.down act (H/4, 128)
# from stage1's residual blocks on, channels are ≥128 and the standard
# path is already MXU-saturated.

def _phase_fold_s1_weight(w: jnp.ndarray) -> jnp.ndarray:
    """3×3 stride-1 conv (3,3,Cin,Cout), original-layout input → one
    4×4 stride-2 conv (4,4,Cin,4Cout) emitting all four output phases
    as channel blocks. Output cell I covers input rows 2I-1..2I+2
    (padding (1,1)); phase pi's tap di lands at window row pi+di+1."""
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((4, 4, cin, 4 * cout), w.dtype)
    for pi in range(2):
        for pj in range(2):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    k = k.at[pi + di + 1, pj + dj + 1, :,
                             (pi * 2 + pj) * cout:(pi * 2 + pj + 1) * cout
                             ].set(w[di + 1, dj + 1])
    return k


def _phase_fold_s2_weight(w: jnp.ndarray) -> jnp.ndarray:
    """3×3 stride-2 conv (3,3,Cin,Cout), S2D-domain input → one 3×3
    stride-2 conv (3,3,4Cin,4Cout) whose output stays in S2D form.

    Original output pixel (2K+pi)·2+di reads input row 4K+2pi+di,
    i.e. input cell offset (2pi+di)>>1 ∈ {pi-1, pi} with input phase
    di&1; window starts at cell 2K-1 (padding (1,0))."""
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for pi in range(2):
        for pj in range(2):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    ti = pi + (di >> 1) + 1
                    tj = pj + (dj >> 1) + 1
                    qi, qj = di & 1, dj & 1
                    k = k.at[ti, tj,
                             (qi * 2 + qj) * cin:(qi * 2 + qj + 1) * cin,
                             (pi * 2 + pj) * cout:(pi * 2 + pj + 1) * cout
                             ].set(w[di + 1, dj + 1])
    return k


def _s2d_conv3_weight(w: jnp.ndarray) -> jnp.ndarray:
    """3×3 stride-1 conv (3,3,Cin,Cout), S2D in AND out → 3×3 cell
    kernel (3,3,4Cin,4Cout): phase pi's tap di reads cell offset
    (pi+di)>>1 ∈ {-1,0,1}, input phase (pi+di)&1. Padding (1,1)."""
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for pi in range(2):
        for pj in range(2):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    si, sj = pi + di, pj + dj
                    ai, qi = si >> 1, si & 1
                    aj, qj = sj >> 1, sj & 1
                    k = k.at[ai + 1, aj + 1,
                             (qi * 2 + qj) * cin:(qi * 2 + qj + 1) * cin,
                             (pi * 2 + pj) * cout:(pi * 2 + pj + 1) * cout
                             ].set(w[di + 1, dj + 1])
    return k


def _blockdiag_1x1_weight(w: jnp.ndarray) -> jnp.ndarray:
    """1×1 conv (1,1,Cin,Cout), S2D in and out → block-diagonal
    (1,1,4Cin,4Cout): each phase maps through the same weights."""
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((1, 1, 4 * cin, 4 * cout), w.dtype)
    for p in range(4):
        k = k.at[0, 0, p * cin:(p + 1) * cin,
                 p * cout:(p + 1) * cout].set(w[0, 0])
    return k


def _s2d_exit_weight(w: jnp.ndarray) -> jnp.ndarray:
    """3×3 stride-2 conv (3,3,Cin,Cout), S2D-domain input → ORIGINAL-
    domain output: 2×2 stride-1 cell kernel (2,2,4Cin,Cout), padding
    (1,0). Output (i,j) reads input rows 2i+di → cell di>>1 ∈ {-1,0},
    phase di&1."""
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            ai, qi = di >> 1, di & 1
            aj, qj = dj >> 1, dj & 1
            k = k.at[ai + 1, aj + 1,
                     (qi * 2 + qj) * cin:(qi * 2 + qj + 1) * cin].set(
                w[di + 1, dj + 1])
    return k


def _tile_bn(bn: Params, r: int = 4) -> Params:
    """BN params for S2D-split channels (phase-major ⇒ plain tile)."""
    return {key: jnp.tile(bn[key], r) for key in ("scale", "bias",
                                                  "mean", "var")}


def _bn_s2d_train(y: jnp.ndarray, bn: Params):
    """Train-mode BatchNorm on an S2D-domain activation (phase-major
    4·C channels). The four phase blocks of a logical channel hold
    disjoint quarters of the SAME original feature map, so pooling the
    batch statistics over (B, H, W, phase) reproduces the standard
    path's per-channel stats exactly (same pixel multiset, same count
    n = B·H₀·W₀). Returns (normalized y, running-stat updates) shaped
    like the ORIGINAL C-channel tree — checkpoints/resume unchanged."""
    from mydetection_tpu.models.layers import BN_EPS, BN_MOMENTUM

    c4 = y.shape[-1]
    c = c4 // 4
    yf = y.astype(jnp.float32).reshape(y.shape[:-1] + (4, c))
    axes = tuple(range(yf.ndim - 1))          # (B, H, W, phase)
    mean = jnp.mean(yf, axis=axes)            # (C,)
    var = jnp.var(yf, axis=axes)
    n = 1
    for a in axes:
        n *= yf.shape[a]
    unbiased = var * (n / max(n - 1, 1))
    new_stats = {
        "mean": BN_MOMENTUM * bn["mean"] + (1 - BN_MOMENTUM) * mean,
        "var": BN_MOMENTUM * bn["var"] + (1 - BN_MOMENTUM) * unbiased,
    }
    scale = bn["scale"] * jax.lax.rsqrt(var + BN_EPS)
    shift = bn["bias"] - mean * scale
    y = (y * jnp.tile(scale, 4).astype(y.dtype)
         + jnp.tile(shift, 4).astype(y.dtype))
    return y, new_stats


def _cbl_s2d(p: Params, x, weight_fn, padding, *, stride=1, tiled_bn=True,
             compute_dtype, train: bool = False):
    """conv_bn_leaky with a phase-transformed weight.

    Returns y in eval mode, (y, bn_stats) in train mode. Train-mode BN
    pools batch stats over the phase blocks (`_bn_s2d_train`) for
    S2D-domain outputs (tiled_bn=True); the exit conv's original-domain
    output uses the standard train BN. Gradients flow through the
    weight folds (pure gather/scatter transforms of p["conv"]["w"]),
    so the S2D chain trains the SAME parameter tree as the standard
    path."""
    y = conv2d(x, weight_fn(p["conv"]["w"]), stride=stride,
               padding=padding, compute_dtype=compute_dtype)
    if train:
        if tiled_bn:
            y, stats = _bn_s2d_train(y, p["bn"])
        else:
            y, stats = batch_norm(y, p["bn"], train=True)
        return leaky_relu(y), stats
    bn = _tile_bn(p["bn"]) if tiled_bn else p["bn"]
    y, _ = batch_norm(y, bn, train=False)
    return leaky_relu(y)


def _early_s2d(params: Params, x: jnp.ndarray, *, compute_dtype,
               packed: bool = False, train: bool = False):
    """stem → stage0.down → stage0.res0 → stage1.down, all in the 2×2
    space-to-depth domain (see module comment). Returns the ORIGINAL-
    domain (B, H/4, W/4, 128) stage1.down activation, numerically equal
    to the standard path. Exactness is pinned by
    tests/test_models.py::test_darknet_s2d_stem_matches_standard_path
    (inference) and test_darknet_s2d_train_matches_standard (train-mode
    forward, BN stats, and gradients).

    Train mode (`train=True`) returns (y, updates) where updates holds
    the phase-pooled BN running-stat updates keyed like the standard
    path's tree: {"stem", "stage0", "stage1_down"} — the caller slots
    "stage1_down" into stage1's update dict.

    `packed`: x is already host-packed S2D-2 (B, H/2, W/2, 12), see
    utils/image_ops.pack_s2d2. The stem conv then IS the S2D-in/out
    3×3 cell conv (`_s2d_conv3_weight`) — no device-side relayout and
    no C=3-minor input tensor at all. Chain output is identical."""
    s0, s1 = params["stage0"], params["stage1"]

    def cbl(p, y, weight_fn, padding, **kw):
        out = _cbl_s2d(p, y, weight_fn, padding,
                       compute_dtype=compute_dtype, train=train, **kw)
        return out if train else (out, None)

    if packed:
        # stem: S2D layout in (12 ch), S2D(4·32) out
        y, st_stem = cbl(params["stem"], x, _s2d_conv3_weight,
                         [(1, 1), (1, 1)])
    else:
        # stem: original layout in, S2D(32ch) out — no input relayout
        y, st_stem = cbl(params["stem"], x, _phase_fold_s1_weight,
                         [(1, 1), (1, 1)], stride=2)
    # stage0 downsample: S2D → S2D (half the cells)
    y, st_down0 = cbl(s0["down"], y, _phase_fold_s2_weight,
                      [(1, 0), (1, 0)], stride=2)
    # stage0's single residual block, phase-inflated
    r, st_c1 = cbl(s0["res0"]["conv1"], y, _blockdiag_1x1_weight,
                   [(0, 0), (0, 0)])
    r, st_c2 = cbl(s0["res0"]["conv2"], r, _s2d_conv3_weight,
                   [(1, 1), (1, 1)])
    y = y + r
    # stage1 downsample exits the S2D domain (output C=128 fills lanes)
    y, st_down1 = cbl(s1["down"], y, _s2d_exit_weight,
                      [(1, 0), (1, 0)], tiled_bn=False)
    if not train:
        return y
    updates = {
        "stem": {"bn": st_stem},
        "stage0": {"down": {"bn": st_down0},
                   "res0": {"conv1": {"bn": st_c1},
                            "conv2": {"bn": st_c2}}},
        "stage1_down": {"bn": st_down1},
    }
    return y, updates


def init(rng: jax.Array) -> Params:
    keys = KeyGen(rng)
    params: Params = {"stem": conv_bn_leaky_init(keys(), 3, 3, 32)}
    c_in = 32
    for si, (nblocks, c_out) in enumerate(zip(STAGE_BLOCKS, STAGE_CHANNELS)):
        stage: Params = {"down": conv_bn_leaky_init(keys(), 3, c_in, c_out)}
        for bi in range(nblocks):
            stage[f"res{bi}"] = {
                "conv1": conv_bn_leaky_init(keys(), 1, c_out, c_out // 2),
                "conv2": conv_bn_leaky_init(keys(), 3, c_out // 2, c_out),
            }
        params[f"stage{si}"] = stage
        c_in = c_out
    return params


def _res_block(p: Params, x: jnp.ndarray, *, train: bool, compute_dtype):
    y, s1 = conv_bn_leaky(p["conv1"], x, train=train, compute_dtype=compute_dtype)
    y, s2 = conv_bn_leaky(p["conv2"], y, train=train, compute_dtype=compute_dtype)
    stats = None
    if train:
        stats = {"conv1": {"bn": s1}, "conv2": {"bn": s2}}
    return x + y, stats


def _use_scan(scan_blocks: bool | None, train: bool = False) -> bool:
    """Resolve the block-scan policy. None = auto: scan on TPU,
    INFERENCE only.

    lax.scan over stacked block params compiles the block body once per
    stage (fast TPU cold-start); on XLA:CPU the scan runtime + scan
    backward are SLOWER than the unrolled graph (measured: train step
    compile 34 s vs 21 s, execution 1.4x slower), so CPU unrolls.

    Training unrolls on TPU too: the scan BACKWARD dominates the train
    step — each reverse iteration re-gathers the block's weights from
    the stacked (n, ...) leaves, scatters dw back with a
    dynamic-update-slice over the full f32 stack (37 MB per stage-2/3
    touch), and round-trips the bf16 activation carry through VMEM
    (XPlane: 43.6 ms of while-op time per 87.3 ms step,
    benchmarks/xplane_top_ops.json). Unrolled, XLA schedules the same
    convs as straight-line code: 87.3 -> 70.9 ms/step (+23% train
    throughput) for ~22 s extra cold compile (56.7 s vs 34.5).
    """
    if scan_blocks is None:
        return jax.default_backend() == "tpu" and not train
    return scan_blocks


def _res_stage(stage: Params, y: jnp.ndarray, nblocks: int, *,
               train: bool, compute_dtype, scan_blocks: bool | None):
    """Run a stage's residual blocks, scanned or unrolled.

    Scanned: the blocks of a stage are structurally identical, so the
    per-block param dicts (kept as `res0..resN` in the tree —
    checkpoint / importer layout unchanged) are stacked into (n, ...)
    leaves and the block body compiles ONCE per stage instead of once
    per block — identical math, much smaller XLA graph.
    """
    blocks = [stage[f"res{bi}"] for bi in range(nblocks)]
    if nblocks == 1 or not _use_scan(scan_blocks, train):
        stats: Params = {}
        for bi in range(nblocks):
            y, s = _res_block(blocks[bi], y, train=train,
                              compute_dtype=compute_dtype)
            if train:
                stats[f"res{bi}"] = s
        return y, (stats if train else None)
    stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *blocks)

    def body(carry, p):
        out, stats = _res_block(p, carry, train=train,
                                compute_dtype=compute_dtype)
        return out, stats

    y, stats_stacked = jax.lax.scan(body, y, stacked)
    stats = None
    if train:
        stats = {
            f"res{bi}": jax.tree_util.tree_map(lambda s, bi=bi: s[bi],
                                               stats_stacked)
            for bi in range(nblocks)
        }
    return y, stats


def _use_s2d(s2d_stem: bool | None, train: bool, x: jnp.ndarray) -> bool:
    """Resolve the space-to-depth early-stage policy. None = auto:
    TPU with spatial dims divisible by 4 (the S2D chain runs through
    two downsamples; every %32 input size qualifies). Training uses
    the chain too — BN batch stats pool over the phase blocks
    (`_bn_s2d_train`, exact) and gradients flow through the weight
    folds; `train` is accepted for signature stability."""
    del train
    ok = x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
    if s2d_stem is None:
        return ok and jax.default_backend() == "tpu"
    return s2d_stem and ok


def apply(params: Params, x: jnp.ndarray, *, train: bool = False,
          compute_dtype=None, scan_blocks: bool | None = None,
          s2d_stem: bool | None = None):
    """x: NHWC float image batch → (C3, C4, C5), plus BN-update tree.

    Returns ((c3, c4, c5), updates) — updates is None in eval mode.
    `scan_blocks`: None (auto: scan on TPU) / True / False.
    `s2d_stem`: None (auto: space-to-depth stem fast path on TPU
    inference) / True / False — same math either way (tested).

    x with 12 channels means host-packed S2D-2 input (see
    utils/image_ops.pack_s2d2): inference-only, forces the S2D chain.
    """
    updates: Params = {}
    packed = x.shape[-1] == 12
    if packed and train:
        raise ValueError("packed S2D-2 input is an inference-only fast "
                         "path (BN batch stats need the original layout)")
    s2d = packed or _use_s2d(s2d_stem, train, x)
    s2d_stage1_down = None
    if s2d:
        # stem + stage0 + stage1.down in one space-to-depth chain
        if train:
            y, s2d_updates = _early_s2d(params, x,
                                        compute_dtype=compute_dtype,
                                        packed=packed, train=True)
            s2d_stage1_down = s2d_updates.pop("stage1_down")
            updates.update(s2d_updates)
        else:
            y = _early_s2d(params, x, compute_dtype=compute_dtype,
                           packed=packed)
    else:
        y, s = conv_bn_leaky(params["stem"], x, train=train,
                             compute_dtype=compute_dtype)
        if train:
            updates["stem"] = {"bn": s}
    feats = []
    for si, nblocks in enumerate(STAGE_BLOCKS):
        if si == 0 and s2d:
            continue  # fully handled inside _early_s2d
        stage = params[f"stage{si}"]
        stage_updates: Params = {}
        if si == 1 and s2d:
            # stage1.down already applied inside _early_s2d
            if train:
                stage_updates["down"] = s2d_stage1_down
        else:
            y, s = conv_bn_leaky(stage["down"], y, stride=2, train=train,
                                 compute_dtype=compute_dtype)
            if train:
                stage_updates["down"] = {"bn": s}
        y, stats = _res_stage(stage, y, nblocks, train=train,
                              compute_dtype=compute_dtype,
                              scan_blocks=scan_blocks)
        if train:
            stage_updates.update(stats)
            updates[f"stage{si}"] = stage_updates
        if si >= 2:  # stages 2/3/4 emit C3/C4/C5 (strides 8/16/32)
            feats.append(y)
    return tuple(feats), (updates if train else None)
