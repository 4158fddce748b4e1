"""Spatial regularization, hole-filling and propagation sweeps.

TPU-native re-design of DepthMap.cpp:475-880:
  * regularize: 5x5 inverse-variance smoothing with distance prior
    (regularizeDepthMapRow, DepthMap.cpp:758-880) — 25 static shifts,
    fully fused elementwise lattice;
  * fill holes: validity integral image via two cumsums
    (buildRegIntegralBuffer, DepthMap.cpp:722-754) + 5x5 neighbor fusion
    (DepthMap.cpp:656-704);
  * propagate: reprojection into the new keyframe as a two-pass scatter —
    scatter-max of idepth resolves occlusions deterministically, then a
    compatibility-gated scatter-add implements the EKF merge
    (propagateDepth, DepthMap.cpp:475-653; the reference's sequential
    first-come-first-served collision handling is order-dependent — ours is
    deterministic and merges against the nearest hypothesis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lsd_slam_tpu import lie
from lsd_slam_tpu.camera import Camera
from lsd_slam_tpu.config import DepthFilterConfig, MappingConfig
from lsd_slam_tpu.ops.interp import bilinear
from lsd_slam_tpu.depth.state import DepthMapState

_DIV_EPS = 1e-10


def _shift(a, dy, dx, fill=0.0):
    """Static-offset shift: out[y, x] = a[y+dy, x+dx] (fill at borders)."""
    out = jnp.full_like(a, fill)
    h, w = a.shape[:2] if a.ndim == 2 else a.shape
    ys0, ys1 = max(dy, 0), h + min(dy, 0)
    xs0, xs1 = max(dx, 0), w + min(dx, 0)
    return out.at[ys0 - dy:ys1 - dy, xs0 - dx:xs1 - dx].set(a[ys0:ys1, xs0:xs1])


def _regularize_accumulators_xla(dest_id, dest_var, dest_valid, validity,
                                 reg_dist_var: float, diff_fac: float):
    """25-tap lattice as whole-array shifts (reference path; CPU)."""
    sum_id = jnp.zeros_like(dest_id)
    sum_ivar = jnp.zeros_like(dest_id)
    val_sum = jnp.zeros_like(dest_id)
    n_occluding = jnp.zeros_like(dest_id)
    n_not_occluding = jnp.zeros_like(dest_id)

    for dy in range(-2, 3):
        for dx in range(-2, 3):
            s_valid = _shift(dest_valid.astype(jnp.float32), dy, dx) > 0
            s_id = _shift(dest_id, dy, dx)
            s_var = _shift(dest_var, dy, dx, fill=1.0)
            s_validity = _shift(validity, dy, dx)

            diff = s_id - dest_id
            compatible = diff_fac * diff * diff <= s_var + dest_var
            use = s_valid & compatible
            n_occluding = n_occluding + (s_valid & ~compatible
                                         & (s_id > dest_id)).astype(jnp.float32)
            n_not_occluding = n_not_occluding + use.astype(jnp.float32)

            dist_fac = float(dx * dx + dy * dy) * reg_dist_var
            ivar = 1.0 / (s_var + dist_fac)
            m = use.astype(jnp.float32)
            sum_id = sum_id + s_id * ivar * m
            sum_ivar = sum_ivar + ivar * m
            val_sum = val_sum + s_validity * m
    return sum_id, sum_ivar, val_sum, n_occluding, n_not_occluding


def regularize(state: DepthMapState, remove_occlusions: bool,
               validity_th: float, dcfg: DepthFilterConfig,
               smoothing_factor: float = 1.0) -> DepthMapState:
    """5x5 smoothing into idepth_smoothed / var_smoothed, validity-sum
    deletion, optional occlusion removal."""
    h, w = state.idepth.shape
    reg_dist_var = dcfg.reg_dist_var_base * smoothing_factor * smoothing_factor

    dest_id = state.idepth
    dest_var = state.var
    dest_valid = state.valid

    from lsd_slam_tpu.ops.pallas_stencil import (
        pallas_regularize_enabled, regularize_accumulators)
    if pallas_regularize_enabled():
        (sum_id, sum_ivar, val_sum, n_occluding,
         n_not_occluding) = regularize_accumulators(
            dest_id, dest_var, dest_valid.astype(jnp.float32),
            state.validity, float(reg_dist_var),
            float(dcfg.diff_fac_smoothing))
    else:
        (sum_id, sum_ivar, val_sum, n_occluding,
         n_not_occluding) = _regularize_accumulators_xla(
            dest_id, dest_var, dest_valid, state.validity,
            float(reg_dist_var), float(dcfg.diff_fac_smoothing))

    interior = jnp.zeros((h, w), bool).at[2:-2, 2:-2].set(True)
    touched = dest_valid & interior

    delete_validity = touched & (val_sum < validity_th)
    if remove_occlusions:
        delete_occ = touched & ~delete_validity & (n_occluding > n_not_occluding)
    else:
        delete_occ = jnp.zeros_like(delete_validity)

    keep = touched & ~delete_validity & ~delete_occ
    safe_ivar = jnp.maximum(sum_ivar, _DIV_EPS)
    smoothed = jnp.where(keep, sum_id / safe_ivar, state.idepth_smoothed)
    var_smoothed = jnp.where(keep, 1.0 / safe_ivar, state.var_smoothed)

    return state.replace(
        valid=state.valid & ~delete_validity & ~delete_occ,
        blacklisted=state.blacklisted - delete_validity.astype(jnp.int32),
        idepth_smoothed=smoothed,
        var_smoothed=var_smoothed,
    )


def fill_holes(state: DepthMapState, kf_max_grad, dcfg: DepthFilterConfig,
               min_abs_grad: float) -> DepthMapState:
    """Create hypotheses at well-supported holes (DepthMap.cpp:656-754)."""
    h, w = state.idepth.shape
    vc = jnp.where(state.valid, state.validity, 0.0)
    integral = jnp.cumsum(jnp.cumsum(vc, axis=1), axis=0)

    # 5x5 inclusive window sum via the integral image, same offsets as
    # io[2+2w] - io[-3+2w] - io[2-3w] + io[-3-3w]
    pad = jnp.pad(integral, ((3, 2), (3, 2)))
    val5 = (pad[5:, 5:] - pad[:-5, 5:] - pad[5:, :-5] + pad[:-5, :-5])

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    region = (ys >= 3) & (ys < h - 2) & (xs >= 3) & (xs < w - 2)

    eligible = (~state.valid) & region & (kf_max_grad >= min_abs_grad)
    create = eligible & (
        ((state.blacklisted >= dcfg.min_blacklist)
         & (val5 > dcfg.val_sum_min_for_create))
        | (val5 > dcfg.val_sum_min_for_unblacklist))

    # 5x5 inverse-variance neighbor fusion from the pre-pass snapshot
    sum_obs = jnp.zeros_like(state.idepth)
    sum_ivar = jnp.zeros_like(state.idepth)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            s_valid = _shift(state.valid.astype(jnp.float32), dy, dx) > 0
            s_id = _shift(state.idepth, dy, dx)
            s_var = _shift(state.var, dy, dx, fill=1.0)
            m = s_valid.astype(jnp.float32)
            sum_obs = sum_obs + s_id / s_var * m
            sum_ivar = sum_ivar + 1.0 / s_var * m

    new_id = sum_obs / jnp.maximum(sum_ivar, _DIV_EPS)
    new_id = jnp.where(jnp.abs(new_id) < _DIV_EPS, _DIV_EPS, new_id)
    create = create & (sum_ivar > 0)

    return state.replace(
        valid=state.valid | create,
        idepth=jnp.where(create, new_id, state.idepth),
        var=jnp.where(create, dcfg.var_random_init_initial, state.var),
        validity=jnp.where(create, 0.0, state.validity),
        idepth_smoothed=jnp.where(create, -1.0, state.idepth_smoothed),
        var_smoothed=jnp.where(create, -1.0, state.var_smoothed),
    )


def propagate(state: DepthMapState, old_to_new_se3, kf_img, new_img,
              new_max_grad, good_mask, have_good_mask,
              cam: Camera, dcfg: DepthFilterConfig, mcfg: MappingConfig):
    """Reproject all hypotheses into a new keyframe (DepthMap.cpp:475-653).

    good_mask: tracker good-pixel grid of the new KF's tracking (full-res,
    already upsampled), used when the new KF was tracked on this one."""
    h, w = state.idepth.shape
    R = lie.quat_to_matrix(old_to_new_se3[0:4])
    t = old_to_new_se3[4:7]

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    src_valid = state.valid & (state.idepth_smoothed > _DIV_EPS)
    safe_id = jnp.where(src_valid, state.idepth_smoothed, 1.0)
    kx = (xs - cam.cx) / cam.fx
    ky = (ys - cam.cy) / cam.fy
    pnx = (R[0, 0] * kx + R[0, 1] * ky + R[0, 2]) / safe_id + t[0]
    pny = (R[1, 0] * kx + R[1, 1] * ky + R[1, 2]) / safe_id + t[1]
    pnz = (R[2, 0] * kx + R[2, 1] * ky + R[2, 2]) / safe_id + t[2]

    safe_z = jnp.where(pnz == 0, _DIV_EPS, pnz)
    new_idepth = 1.0 / safe_z
    u_new = pnx * new_idepth * cam.fx + cam.cx
    v_new = pny * new_idepth * cam.fy + cam.cy

    in_b = (u_new > 2.1) & (v_new > 2.1) & (u_new < w - 3.1) & (v_new < h - 3.1)
    keep = src_valid & in_b & (pnz > 0)

    tx = jnp.clip((u_new + 0.5).astype(jnp.int32), 0, w - 1)
    ty = jnp.clip((v_new + 0.5).astype(jnp.int32), 0, h - 1)
    dest_grad = new_max_grad[ty, tx]

    if have_good_mask:
        keep = keep & good_mask & (dest_grad >= mcfg.min_use_grad)
    else:
        dest_color = bilinear(new_img, u_new, v_new)
        resid = dest_color - kf_img
        bad_color = (resid * resid
                     / (1600.0 + 0.25 * dest_grad * dest_grad)) > 1.0
        keep = keep & ~bad_color & (dest_grad >= mcfg.min_use_grad)

    # variance grows with (d_new/d_old)^4 (DepthMap.cpp:574-580)
    ratio = new_idepth / jnp.where(src_valid, safe_id, 1.0)
    new_var = (ratio ** 4) * state.var

    flat_idx = (ty * w + tx).reshape(-1)
    keep_f = keep.reshape(-1)
    idx_or_oob = jnp.where(keep_f, flat_idx, h * w)  # dump dropped into slot hw

    src_id = new_idepth.reshape(-1)
    src_var = jnp.maximum(new_var.reshape(-1), _DIV_EPS)
    src_validity = state.validity.reshape(-1)

    # pass 1: nearest (max idepth) hypothesis per target
    maxbuf = jnp.full((h * w + 1,), -jnp.inf, jnp.float32)
    maxbuf = maxbuf.at[idx_or_oob].max(jnp.where(keep_f, src_id, -jnp.inf))
    tgt_max = maxbuf[idx_or_oob]
    maxvarbuf = jnp.zeros((h * w + 1,), jnp.float32)
    is_max = keep_f & (src_id == tgt_max)
    maxvarbuf = maxvarbuf.at[idx_or_oob].max(jnp.where(is_max, src_var, 0.0))
    tgt_max_var = maxvarbuf[idx_or_oob]

    # pass 2: merge everything compatible with the nearest hypothesis
    diff = src_id - tgt_max
    compatible = keep_f & (dcfg.diff_fac_prop_merge * diff * diff
                           <= src_var + tgt_max_var)

    ssum = jnp.zeros((h * w + 1,), jnp.float32)
    id_sum = ssum.at[idx_or_oob].add(
        jnp.where(compatible, src_id / src_var, 0.0))
    ivar_sum = ssum.at[idx_or_oob].add(jnp.where(compatible, 1.0 / src_var, 0.0))
    validity_sum = ssum.at[idx_or_oob].add(
        jnp.where(compatible, src_validity, 0.0))
    count = ssum.at[idx_or_oob].add(jnp.where(compatible, 1.0, 0.0))

    tgt_valid = (count[:h * w] > 0).reshape(h, w)
    safe_ivar = jnp.maximum(ivar_sum[:h * w], _DIV_EPS).reshape(h, w)
    tgt_id = jnp.where(tgt_valid, id_sum[:h * w].reshape(h, w) / safe_ivar, 0.0)
    tgt_var = jnp.where(tgt_valid, 1.0 / safe_ivar, 0.0)
    validity_cap = dcfg.validity_counter_max + dcfg.validity_counter_max_variable
    tgt_validity = jnp.where(
        tgt_valid,
        jnp.minimum(validity_sum[:h * w].reshape(h, w), validity_cap), 0.0)

    return DepthMapState(
        valid=tgt_valid,
        idepth=jnp.where(tgt_valid, _unzero_like(tgt_id), 0.0),
        var=tgt_var,
        idepth_smoothed=jnp.full((h, w), -1.0, jnp.float32),
        var_smoothed=jnp.full((h, w), -1.0, jnp.float32),
        validity=tgt_validity,
        blacklisted=jnp.zeros((h, w), jnp.int32),
        next_min_id=jnp.zeros((h, w), jnp.float32),
    )


def _unzero_like(x):
    return jnp.where(jnp.abs(x) < _DIV_EPS,
                     jnp.where(x < 0, -_DIV_EPS, _DIV_EPS), x)
