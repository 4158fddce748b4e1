"""Pallas TPU kernel for the 5x5 depth-regularization stencil.

The regularize sweep (DepthMap.cpp:758-880) evaluates 25 taps per pixel,
each tap combining four planes (idepth, var, valid, validity) into five
accumulators. Expressed as whole-array shifts in XLA (depth/regularize.py)
that is ~100 shifted full-image temporaries; XLA fuses much of it but still
streams the inputs from HBM several times. This kernel keeps the four
padded input planes resident in VMEM once and runs the whole 25-tap
lattice per row tile on the VPU — one HBM read per input, one write per
output.

Used on the TPU backend; the XLA lattice remains the reference/CPU path
(tests compare the two in interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile_h(h: int) -> int:
    # multiples of 8 only: the per-tile block load offset i*tile_h must be
    # provably 8-aligned for Mosaic's vector loads (sublane granularity).
    # Small tiles keep the unrolled 25-tap temporaries inside the ~16 MB
    # scoped-VMEM stack (a 120-row tile at 640 px OOMs it).
    for t in (32, 24, 16, 40, 8, 48, 64, 80, 96, 120, 128):
        if h % t == 0:
            return t
    return h


def _kernel(idp_ref, var_ref, val_ref, vdy_ref,
            o_sid, o_sivar, o_vsum, o_nocc, o_nnot,
            *, tile_h: int, w: int, reg_dist_var: float, diff_fac: float):
    i = pl.program_id(0)
    r0 = i * tile_h  # multiple of tile_h (itself a multiple of 8)

    # ONE aligned (tile_h+8)-row block load per plane; all 25 tap offsets
    # become STATIC in-register slices of it. Mosaic rejects memory loads
    # at dynamic offsets like r0+2+dy (not provably sublane-aligned).
    rows = pl.ds(r0, tile_h + 8)
    idp = idp_ref[rows, :]
    var = var_ref[rows, :]
    val = val_ref[rows, :]
    vdy = vdy_ref[rows, :]

    c_id = idp[2:2 + tile_h, 2:2 + w]
    c_var = var[2:2 + tile_h, 2:2 + w]

    sid = jnp.zeros((tile_h, w), jnp.float32)
    sivar = jnp.zeros((tile_h, w), jnp.float32)
    vsum = jnp.zeros((tile_h, w), jnp.float32)
    nocc = jnp.zeros((tile_h, w), jnp.float32)
    nnot = jnp.zeros((tile_h, w), jnp.float32)

    for dy in range(-2, 3):
        rsl = slice(2 + dy, 2 + dy + tile_h)
        for dx in range(-2, 3):
            cols = slice(2 + dx, 2 + dx + w)
            s_id = idp[rsl, cols]
            s_var = var[rsl, cols]
            s_val = val[rsl, cols]
            s_vdy = vdy[rsl, cols]

            diff = s_id - c_id
            compatible = diff_fac * diff * diff <= s_var + c_var
            is_valid = s_val > 0.0
            use = is_valid & compatible
            m = use.astype(jnp.float32)

            nocc += (is_valid & (~compatible) & (s_id > c_id)).astype(
                jnp.float32)
            nnot += m

            ivar = 1.0 / (s_var + float(dx * dx + dy * dy) * reg_dist_var)
            sid += s_id * ivar * m
            sivar += ivar * m
            vsum += s_vdy * m

    o_sid[:] = sid
    o_sivar[:] = sivar
    o_vsum[:] = vsum
    o_nocc[:] = nocc
    o_nnot[:] = nnot


@functools.partial(jax.jit,
                   static_argnames=("reg_dist_var", "diff_fac", "interpret"))
def regularize_accumulators(idepth, var, valid_f, validity,
                            reg_dist_var: float, diff_fac: float,
                            interpret: bool = False):
    """The five 25-tap accumulators of regularizeDepthMap
    (DepthMap.cpp:788-846) in one fused VMEM pass.

    Inputs are (H, W) f32 planes (valid_f: 1.0/0.0). Returns
    (sum_id, sum_ivar, val_sum, n_occluding, n_not_occluding); the caller
    applies the deletion/keep logic (tiny elementwise epilogue XLA fuses).
    Border taps read zero-validity padding, so pixels outside the 2-px
    interior simply accumulate fewer taps — identical to the XLA lattice's
    zero-fill shifts."""
    h, w = idepth.shape
    tile_h = _pick_tile_h(h)
    # bottom pad of 6 (not 2): the last tile's aligned block load reads
    # tile_h+8 rows starting at h-tile_h, i.e. up to padded row h+8
    pad = ((2, 6), (2, 2))
    idp_p = jnp.pad(idepth, pad)
    var_p = jnp.pad(var, pad, constant_values=1.0)
    val_p = jnp.pad(valid_f, pad)
    vdy_p = jnp.pad(validity, pad)

    out = jax.ShapeDtypeStruct((h, w), jnp.float32)
    grid = (h // tile_h,)
    out_spec = pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, w=w,
                          reg_dist_var=float(reg_dist_var),
                          diff_fac=float(diff_fac)),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(out_spec,) * 5,
        out_shape=(out,) * 5,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=25 * 12 * h * w, transcendentals=0,
            bytes_accessed=9 * h * w * 4),
    )
    return fn(idp_p, var_p, val_p, vdy_p)


def pallas_regularize_enabled() -> bool:
    """Auto gate: the kernel targets the TPU backend; CPU keeps the XLA
    lattice (interpret-mode Pallas would be far slower there)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
