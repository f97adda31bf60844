"""Pallas TPU kernel: fused bias + GroupNorm + ReLU (one HBM round-trip).

FCOS's conv towers interleave GroupNorm between every conv
(models/fcos.py `_tower`, GN_GROUPS=32). XLA cannot fuse the GN stats
reduce into the conv (conv is an opaque kernel) nor the normalize into
the stats pass (full-tensor dependence), so each GN costs ~3 extra HBM
passes over the (B, H, W, 256) activation — the measured reason the
FCOS serving MFU floor sits ~20 points below RetinaNet's (README;
VERDICT r3 weak/next #9).

This kernel processes ONE IMAGE per grid step with the whole (H·W, C)
slab VMEM-resident (P3@608 is 76·76·256·4 B = 5.9 MB f32 — far under
VMEM), so bias-add, per-group mean/var, normalize, affine, and ReLU
happen in a single read→compute→write pass.

Mosaic constraints (same as the NMS kernels): everything stays 2-D
((H·W, C), (1, C), (1, G)); the per-group reductions are one-hot MXU
contractions over a static (C, G) group-membership matrix — exact in
f32 at HIGHEST precision (pure selection, see nms_kernel.py).

Inference-only: training keeps the pure-jax `fcos.group_norm` (this
kernel has no VJP). Semantics pinned against that oracle in
tests/test_fcos.py and on hardware by benchmarks/fcos_gn_experiments.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_kernel(x_ref, bias_ref, scale_ref, shift_ref, out_ref, *,
               groups: int, eps: float, relu: bool):
    """x_ref (1, HW, C); bias/scale/shift (1, C); out (1, HW, C)."""
    hw, c = x_ref.shape[1], x_ref.shape[2]
    cpg = c // groups  # channels per group
    xf = x_ref[0].astype(jnp.float32) + bias_ref[0:1, :]      # (HW, C)
    # static group membership: onehot[c, g] = 1 iff channel c in group g
    col_c = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    col_g = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    onehot = ((col_c // cpg) == col_g).astype(jnp.float32)    # (C, G)

    csum = jnp.sum(xf, axis=0, keepdims=True)                 # (1, C)
    csq = jnp.sum(xf * xf, axis=0, keepdims=True)             # (1, C)
    hp = jax.lax.Precision.HIGHEST
    gsum = jax.lax.dot_general(csum, onehot, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=hp)                  # (1, G)
    gsq = jax.lax.dot_general(csq, onehot, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=hp)
    n = jnp.float32(hw * cpg)
    mean_g = gsum / n
    var_g = jnp.maximum(gsq / n - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)                        # (1, G)
    # broadcast per-group stats back to channels: (1, G) @ (G, C)
    onehot_t = ((col_c // cpg) == col_g).astype(jnp.float32)  # reuse (C, G)
    mean_c = jax.lax.dot_general(mean_g, onehot_t,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=hp)                # (1, C)
    inv_c = jax.lax.dot_general(inv_g, onehot_t,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=hp)
    y = (xf - mean_c) * inv_c * scale_ref[0:1, :] + shift_ref[0:1, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


def bias_gn_relu_pallas_impl(x: jnp.ndarray, bias: jnp.ndarray,
                             scale: jnp.ndarray, shift: jnp.ndarray, *,
                             groups: int = 32, eps: float = 1e-5,
                             relu: bool = True,
                             interpret: bool = False) -> jnp.ndarray:
    """Fused y = relu(GN(x + bias) * scale + shift), x (B, H, W, C).

    Stats are per (image, group) over (H, W, C/groups) — exactly
    `models/fcos.group_norm` after a bias add. Output keeps x.dtype.
    """
    b, h, w, c = x.shape
    assert c % groups == 0, (c, groups)
    x2 = x.reshape(b, h * w, c)
    row = lambda v: v.astype(jnp.float32).reshape(1, c)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=float(eps),
                          relu=relu),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), x.dtype),
        # the f32 working set (xf, xf², y) is ~3x the block — P3@608 is
        # 5776x256: ~18 MB, past the default 16 MB scoped-vmem cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2, row(bias), row(scale), row(shift))
    return out.reshape(b, h, w, c)


bias_gn_relu_pallas = jax.jit(
    bias_gn_relu_pallas_impl,
    static_argnames=("groups", "eps", "relu", "interpret"))
