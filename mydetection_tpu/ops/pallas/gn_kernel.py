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

Trainable: `bias_gn_relu_trainable` pairs this forward with a fused
single-pass backward kernel via `jax.custom_vjp` (VERDICT r4 next #3)
— GN backward reduces over the same (HW, C/G) slabs, so one
read(x,y,dy)→compute→write(dx) pass replaces XLA's multi-pass
autodiff chain. Gradients pinned against the pure-jax
`fcos.group_norm` oracle in tests/test_fcos.py; semantics pinned on
hardware by benchmarks/fcos_gn_experiments.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_onehot(c: int, groups: int):
    """Static (C, G) membership matrix: onehot[c, g] = 1 iff channel c
    in group g. Per-group reductions become exact one-hot MXU
    contractions (pure selection — see nms_kernel.py)."""
    cpg = c // groups
    col_c = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    col_g = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return ((col_c // cpg) == col_g).astype(jnp.float32)


_HP = jax.lax.Precision.HIGHEST


def _dot(a, b, contract):
    return jax.lax.dot_general(a, b, (contract, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HP)


def _gn_kernel(x_ref, bias_ref, scale_ref, shift_ref, out_ref, *,
               groups: int, eps: float, relu: bool,
               mean_ref=None, inv_ref=None):
    """x_ref (1, HW, C); bias/scale/shift (1, C); out (1, HW, C).
    When mean_ref/inv_ref are given (the trainable fwd), also writes
    the per-group stats (1, G) — the backward's residuals."""
    hw, c = x_ref.shape[1], x_ref.shape[2]
    cpg = c // groups  # channels per group
    xf = x_ref[0].astype(jnp.float32) + bias_ref[0:1, :]      # (HW, C)
    onehot = _group_onehot(c, groups)                         # (C, G)

    csum = jnp.sum(xf, axis=0, keepdims=True)                 # (1, C)
    csq = jnp.sum(xf * xf, axis=0, keepdims=True)             # (1, C)
    gsum = _dot(csum, onehot, ((1,), (0,)))                   # (1, G)
    gsq = _dot(csq, onehot, ((1,), (0,)))
    n = jnp.float32(hw * cpg)
    mean_g = gsum / n
    var_g = jnp.maximum(gsq / n - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)                        # (1, G)
    # broadcast per-group stats back to channels: contract G with
    # onehot's G axis — (1, G) x (C, G) -> (1, C)
    mean_c = _dot(mean_g, onehot, ((1,), (1,)))               # (1, C)
    inv_c = _dot(inv_g, onehot, ((1,), (1,)))
    y = (xf - mean_c) * inv_c * scale_ref[0:1, :] + shift_ref[0:1, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)
    if mean_ref is not None:   # (1, 1, G) blocks: [0] is (1, G)
        mean_ref[0] = mean_g
        inv_ref[0] = inv_g


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


# ---------------------------------------------------------------------------
# trainable path: fused forward (with saved stats) + fused single-pass
# backward, paired via jax.custom_vjp (VERDICT r4 next #3)
# ---------------------------------------------------------------------------

def _gn_fwd_stats_kernel(x_ref, bias_ref, scale_ref, shift_ref,
                         out_ref, mean_ref, inv_ref, *,
                         groups: int, eps: float, relu: bool):
    _gn_kernel(x_ref, bias_ref, scale_ref, shift_ref, out_ref,
               groups=groups, eps=eps, relu=relu,
               mean_ref=mean_ref, inv_ref=inv_ref)


def _gn_bwd_kernel(x_ref, y_ref, dy_ref, bias_ref, scale_ref,
                   mean_ref, inv_ref,
                   dx_ref, dbias_ref, dscale_ref, dshift_ref, *,
                   groups: int, relu: bool):
    """One image per grid step, everything VMEM-resident.

    GN backward (standard analytic form, per group of size n):
      dpre  = dy ⊙ 1[y>0]                    (ReLU through saved output)
      dxhat = dpre · scale_c
      dxf   = inv_c · (dxhat − mean_g(dxhat) − xhat · mean_g(dxhat·xhat))
      dx = dxf;  dbias = Σ dxf;  dscale = Σ dpre·xhat;  dshift = Σ dpre
    The param grads accumulate across grid steps into (1, C) outputs
    (constant index_map; initialized at step 0 — the TPU grid is
    sequential so read-modify-write is race-free)."""
    hw, c = x_ref.shape[1], x_ref.shape[2]
    cpg = c // groups
    onehot = _group_onehot(c, groups)                         # (C, G)
    mean_c = _dot(mean_ref[0], onehot, ((1,), (1,)))          # (1, C)
    inv_c = _dot(inv_ref[0], onehot, ((1,), (1,)))

    xf = x_ref[0].astype(jnp.float32) + bias_ref[0:1, :]      # (HW, C)
    xhat = (xf - mean_c) * inv_c
    dy = dy_ref[0].astype(jnp.float32)
    if relu:
        dpre = jnp.where(y_ref[0].astype(jnp.float32) > 0.0, dy, 0.0)
    else:
        dpre = dy
    dxhat = dpre * scale_ref[0:1, :]

    s1_c = jnp.sum(dxhat, axis=0, keepdims=True)              # (1, C)
    s2_c = jnp.sum(dxhat * xhat, axis=0, keepdims=True)
    n = jnp.float32(hw * cpg)
    s1_g = _dot(s1_c, onehot, ((1,), (0,))) / n               # (1, G)
    s2_g = _dot(s2_c, onehot, ((1,), (0,))) / n
    s1_bc = _dot(s1_g, onehot, ((1,), (1,)))                  # (1, C)
    s2_bc = _dot(s2_g, onehot, ((1,), (1,)))
    dxf = inv_c * (dxhat - s1_bc - xhat * s2_bc)
    dx_ref[0] = dxf.astype(dx_ref.dtype)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dshift_ref[:] = jnp.zeros_like(dshift_ref)

    dbias_ref[:] += jnp.sum(dxf, axis=0, keepdims=True)
    dscale_ref[:] += jnp.sum(dpre * xhat, axis=0, keepdims=True)
    dshift_ref[:] += jnp.sum(dpre, axis=0, keepdims=True)


def _fwd_with_stats(x, bias, scale, shift, *, groups, eps, relu, interpret):
    b, h, w, c = x.shape
    assert c % groups == 0, (c, groups)
    x2 = x.reshape(b, h * w, c)
    row = lambda v: v.astype(jnp.float32).reshape(1, c)  # noqa: E731
    out, mean_g, inv_g = pl.pallas_call(
        functools.partial(_gn_fwd_stats_kernel, groups=groups,
                          eps=float(eps), relu=relu),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, G) not (B, G): Mosaic requires the 2nd-to-last
            # block dim to divide 8 or equal the array dim — a (1, G)
            # block of a (B, G) array does neither
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h * w, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, groups), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, groups), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2, row(bias), row(scale), row(shift))
    return out.reshape(b, h, w, c), mean_g, inv_g


def _bwd_fused(x, y, dy, bias, scale, mean_g, inv_g, *,
               groups, relu, interpret):
    b, h, w, c = x.shape
    x2 = x.reshape(b, h * w, c)
    y2 = y.reshape(b, h * w, c)
    dy2 = dy.reshape(b, h * w, c)
    row = lambda v: v.astype(jnp.float32).reshape(1, c)  # noqa: E731
    slab = lambda: pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    vec_c = lambda: pl.BlockSpec((1, c), lambda i: (0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    vec_g = lambda: pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    dx, dbias, dscale, dshift = pl.pallas_call(
        functools.partial(_gn_bwd_kernel, groups=groups, relu=relu),
        grid=(b,),
        in_specs=[slab(), slab(), slab(), vec_c(), vec_c(),
                  vec_g(), vec_g()],
        out_specs=[slab(), vec_c(), vec_c(), vec_c()],
        out_shape=[
            jax.ShapeDtypeStruct((b, h * w, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2, y2, dy2, row(bias), row(scale), mean_g, inv_g)
    return (dx.reshape(b, h, w, c), dbias.reshape(c), dscale.reshape(c),
            dshift.reshape(c))


@functools.lru_cache(maxsize=None)
def _make_trainable(groups: int, eps: float, relu: bool, interpret: bool):
    @jax.custom_vjp
    def f(x, bias, scale, shift):
        return bias_gn_relu_pallas_impl(x, bias, scale, shift,
                                        groups=groups, eps=eps, relu=relu,
                                        interpret=interpret)

    def fwd(x, bias, scale, shift):
        out, mean_g, inv_g = _fwd_with_stats(
            x, bias, scale, shift, groups=groups, eps=eps, relu=relu,
            interpret=interpret)
        return out, (x, out, bias, scale, mean_g, inv_g)

    def bwd(res, dy):
        x, y, bias, scale, mean_g, inv_g = res
        dx, dbias, dscale, dshift = _bwd_fused(
            x, y, dy, bias, scale, mean_g, inv_g,
            groups=groups, relu=relu, interpret=interpret)
        return (dx, dbias.astype(bias.dtype), dscale.astype(scale.dtype),
                dshift.astype(scale.dtype))

    f.defvjp(fwd, bwd)
    return f


def bias_gn_relu_trainable(x, bias, scale, shift, *, groups: int = 32,
                           eps: float = 1e-5, relu: bool = True,
                           interpret: bool = False):
    """Differentiable fused bias+GN+ReLU: the Pallas forward paired
    with the fused backward kernel via custom_vjp. Value is identical
    to `bias_gn_relu_pallas_impl`; gradients pinned against the
    pure-jax oracle in tests/test_fcos.py."""
    return _make_trainable(groups, float(eps), relu, interpret)(
        x, bias, scale, shift)
