"""Epipolar-line stereo observation: the depth filter's hot sweep.

TPU-native re-design of observeDepth / makeAndCheckEPL / doLineStereo /
observeDepthCreate / observeDepthUpdate (DepthMap.cpp:147-473, 1442-1972):

  * the per-pixel variable-length EPL walk becomes a fixed 34-step masked
    search over a precomputed 38-sample lattice (bounded by design:
    MAX_EPL_LENGTH_CROP=30 + 2 extension + padding, settings.h:116-117);
  * the 14 outcome codes become a small int code lattice;
  * the 5-tap SSD with alternating A/B buffers (DepthMap.cpp:1671-1750)
    becomes a length-5 correlation over the sample axis;
  * subpixel refinement via error-gradient zero crossing
    (DepthMap.cpp:1767-1848) and the geometric/photometric disparity-error
    variance model (DepthMap.cpp:1874-1930) are kept exactly;
  * creation seeds over [0, 1/MIN_DEPTH], EKF update fuses within
    [prior - 2 sigma, prior + 2 sigma] (STEREO_EPL_VAR_FAC).

The ambiguity check matches the reference exactly (DepthMap.cpp:1761-1765):
the global second-best minimum rejects only when it sits non-adjacent to
the winner — an adjacent second-best is a smooth SSD valley, not ambiguity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lsd_slam_tpu import lie
from lsd_slam_tpu.camera import Camera
from lsd_slam_tpu.config import DepthFilterConfig, MappingConfig
from lsd_slam_tpu.ops.interp import patch16_pack, patch16_sample
from lsd_slam_tpu.depth.state import DepthMapState

# Stat-counter names `observe` returns, in the sorted order hosts use to
# unpack the fused scalar vector (must match the dict built at the bottom
# of `observe`).
OBSERVE_STAT_KEYS = ("active", "blacklisted", "created", "inconsistent",
                     "killed", "oob", "processed", "update_failed",
                     "updated")

_HI = jax.lax.Precision.HIGHEST

MAX_STEPS = 34          # >= MAX_EPL_LENGTH_CROP + 2 extension + rounding
N_SAMPLES = MAX_STEPS + 4

# outcome codes (match the reference's return values where negative)
OK = 0
ERR_OOB = -1            # epl out of bounds -> try again later
ERR_FAIL = -2           # ambiguous / nan / negative idepth
ERR_BIG = -3            # error too large
ERR_NAN = -4            # arithmetic blow-up

_UNZERO_EPS = 1e-10
_DIV_EPS = 1e-10


def _unzero(x):
    return jnp.where(jnp.abs(x) < _UNZERO_EPS,
                     jnp.where(x < 0, -_UNZERO_EPS, _UNZERO_EPS), x)


def make_epl(t_r2k, kf_img, cam: Camera, cfg: DepthFilterConfig):
    """Per-pixel epipolar direction in the keyframe + validity checks
    (== makeAndCheckEPL, DepthMap.cpp:184-234)."""
    h, w = kf_img.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    epx = -cam.fx * t_r2k[0] + t_r2k[2] * (xs - cam.cx)
    epy = -cam.fy * t_r2k[1] + t_r2k[2] * (ys - cam.cy)
    finite = jnp.isfinite(epx + epy)

    lsq = epx * epx + epy * epy
    ok_len = lsq >= cfg.min_epl_length_squared

    # raw (not halved) central differences, like the reference's direct reads
    gx = jnp.zeros_like(kf_img).at[:, 1:-1].set(kf_img[:, 2:] - kf_img[:, :-2])
    gy = jnp.zeros_like(kf_img).at[1:-1, :].set(kf_img[2:, :] - kf_img[:-2, :])
    dot = gx * epx + gy * epy
    safe_lsq = jnp.maximum(lsq, _DIV_EPS)
    egs = dot * dot / safe_lsq
    ok_grad = egs >= cfg.min_epl_grad_squared
    ok_angle = egs / jnp.maximum(gx * gx + gy * gy, _DIV_EPS) >= cfg.min_epl_angle_squared

    fac = cfg.gradient_sample_dist / jnp.sqrt(safe_lsq)
    return (epx * fac, epy * fac), (finite & ok_len & ok_grad & ok_angle)


def line_stereo(xs, ys, prior_idepth, min_idepth, max_idepth, epxn, epyn,
                kf_img, kf_gx, kf_gy, ref_img,
                kf_to_ref, ref_to_kf, tracking_error_fac,
                cam: Camera, dcfg: DepthFilterConfig, mcfg: MappingConfig,
                use_subpixel: bool, k_sel=None):
    """Vectorized doLineStereo over an arbitrary point set.

    xs/ys: pixel coordinates of the points to process (any shape N...);
    per-point inputs (prior/min/max idepth, epl dirs, kf_gx/kf_gy) share
    that shape; kf_img/ref_img stay full (H, W) for sampling. Returns
    (code, result_idepth, result_var, result_epl_length, best_match_err)
    in the point shape. Compaction to the active point set is what makes
    this sweep fast on TPU — gathers cost per row, so running the 38-sample
    lattice only on active semi-dense pixels (~15% of the grid) is the
    single biggest mapping optimization.

    Multi-reference mode (k_sel not None): ref_img is a (K, H, W) stack,
    kf_to_ref / ref_to_kf are (K, 7), tracking_error_fac is (K,), and
    k_sel gives each point's reference-frame index — the per-pixel frame
    choice of the reference's referenceFrameByID dispatch
    (DepthMap.cpp:302-329): one mapping iteration consumes a whole queue
    of tracked frames, every pixel doing stereo against the frame its
    nextStereoFrameMinID selects.
    """
    # patch16 grouped sampling packs each 3-sample lattice triple (plus the
    # 2-px descriptor pair) into one 4x4 gather window; that only
    # interpolates (never extrapolates) while consecutive samples are
    # <= ~1.4 px apart, i.e. gradient_sample_dist <= 1.0.
    assert dcfg.gradient_sample_dist <= 1.0, (
        "patch16 grouped EPL sampling requires gradient_sample_dist <= 1.0 "
        f"(got {dcfg.gradient_sample_dist}); larger spacings would make "
        "patch16_sample extrapolate with negative weights")
    h, w = kf_img.shape

    if k_sel is None:
        R_k2r = lie.quat_to_matrix(kf_to_ref[0:4])          # (3, 3)
        t_k2r = kf_to_ref[4:7]                              # (3,)
        tef = tracking_error_fac
    else:
        R_all = jax.vmap(lie.quat_to_matrix)(kf_to_ref[:, 0:4])   # (K,3,3)
        t_all = kf_to_ref[:, 4:7]                                 # (K,3)
        R_k2r = R_all[k_sel]                                # (..., 3, 3)
        t_k2r = t_all[k_sel]                                # (..., 3)
        tef = tracking_error_fac[k_sel]
    K = jnp.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]],
                  jnp.float32)
    # K_otherToThis_R / K_otherToThis_t, per point in multi mode
    KR = jnp.matmul(K, R_k2r, precision=_HI)
    Kt = jnp.matmul(t_k2r[..., None, :], jnp.transpose(K),
                    precision=_HI)[..., 0, :] if k_sel is not None \
        else jnp.matmul(K, t_k2r, precision=_HI)

    # KinvP = ray of the KF pixel
    kx = (xs - cam.cx) / cam.fx
    ky = (ys - cam.cy) / cam.fy
    p_inf = (KR[..., :, 0] * kx[..., None] + KR[..., :, 1] * ky[..., None]
             + KR[..., :, 2])                               # (..., 3)

    safe_prior = jnp.maximum(prior_idepth, _DIV_EPS)
    Kt_z = Kt[..., 2]
    rescale = p_inf[..., 2] + Kt_z * safe_prior   # == pReal_z * prior

    ok = jnp.ones(xs.shape, bool)
    code = jnp.zeros(xs.shape, jnp.int32)

    def fail(ok, code, cond, c):
        newly = ok & cond
        return ok & ~cond, jnp.where(newly, c, code)

    # 5-tap descriptor footprint must stay inside the KF image
    fx_off = 2 * epxn * rescale
    fy_off = 2 * epyn * rescale
    oob_kf = ((xs - fx_off <= 0) | (xs - fx_off >= w - 2)
              | (ys - fy_off <= 0) | (ys - fy_off >= h - 2)
              | (xs + fx_off <= 0) | (xs + fx_off >= w - 2)
              | (ys + fy_off <= 0) | (ys + fy_off >= h - 2))
    ok, code = fail(ok, code, oob_kf, ERR_OOB)
    ok, code = fail(ok, code, ~((rescale > 0.7) & (rescale < 1.4)), ERR_OOB)

    # keyframe 5-tap descriptor — patch16 grouped bilinear: gathers
    # dominate this sweep and cost per gathered ROW, so taps are grouped
    # {-2,-1} {0,1} {2} (spacing <= 1.4 px/axis always shares a 4x4 patch)
    # for 3 row-gathers instead of 5
    kf_patch = patch16_pack(kf_img)
    tap_j = jnp.asarray([[-2.0, -1.0], [0.0, 1.0], [2.0, 2.0]], jnp.float32)
    tap_x = xs[..., None, None] + tap_j * (epxn * rescale)[..., None, None]
    tap_y = ys[..., None, None] + tap_j * (epyn * rescale)[..., None, None]
    taps = patch16_sample(kf_patch, h, w, tap_x, tap_y)    # (..., 3, 2)
    real_vals = jnp.stack(
        [taps[..., 0, 0], taps[..., 0, 1], taps[..., 1, 0],
         taps[..., 1, 1], taps[..., 2, 0]], axis=-1)       # (..., 5)

    # near/far endpoints on the EPL in the ref image (DepthMap.cpp:1489-1512)
    p_close = p_inf + Kt * max_idepth[..., None]
    behind = p_close[..., 2] < 0.001
    max_idepth = jnp.where(behind, (0.001 - p_inf[..., 2]) / jnp.where(
        Kt_z == 0, _DIV_EPS, Kt_z), max_idepth)
    p_close = p_inf + Kt * max_idepth[..., None]
    pcz = _unzero(p_close[..., 2])
    p_close = p_close / pcz[..., None]

    p_far = p_inf + Kt * min_idepth[..., None]
    ok, code = fail(ok, code,
                    (p_far[..., 2] < 0.001) | (max_idepth < min_idepth),
                    ERR_OOB)
    pfz = _unzero(p_far[..., 2])
    p_far = p_far / pfz[..., None]

    ok, code = fail(ok, code, ~jnp.isfinite(p_far[..., 0] + p_close[..., 0]),
                    ERR_NAN)

    incx = p_close[..., 0] - p_far[..., 0]
    incy = p_close[..., 1] - p_far[..., 1]
    epl_len = jnp.sqrt(incx * incx + incy * incy)
    ok, code = fail(ok, code, ~(epl_len > 0) | ~jnp.isfinite(epl_len), ERR_NAN)
    safe_len = jnp.maximum(epl_len, _DIV_EPS)

    # crop to MAX_EPL_LENGTH_CROP
    crop = epl_len > dcfg.max_epl_length_crop
    cfac = jnp.where(crop, dcfg.max_epl_length_crop / safe_len, 1.0)
    pcx = p_far[..., 0] + incx * cfac
    pcy = p_far[..., 1] + incy * cfac

    incx = incx * dcfg.gradient_sample_dist / safe_len
    incy = incy * dcfg.gradient_sample_dist / safe_len

    pfx = p_far[..., 0] - incx
    pfy = p_far[..., 1] - incy
    pcx = pcx + incx
    pcy = pcy + incy

    # pad short epls to MIN_EPL_LENGTH_CROP
    pad = jnp.where(epl_len < dcfg.min_epl_length_crop,
                    (dcfg.min_epl_length_crop - epl_len) / 2.0, 0.0)
    pfx = pfx - incx * pad
    pfy = pfy - incy * pad
    pcx = pcx + incx * pad
    pcy = pcy + incy * pad

    b = float(dcfg.sample_point_to_border)
    ok, code = fail(ok, code,
                    (pfx <= b) | (pfx >= w - b) | (pfy <= b) | (pfy >= h - b),
                    ERR_OOB)

    # near point outside: clamp along the line (DepthMap.cpp:1566-1613).
    # NOTE: the min-length-8 rejection applies only when the near point was
    # actually clamped (it's nested inside that branch in the reference) —
    # ordinary short EPLs are padded to MIN_EPL_LENGTH_CROP and pass.
    was_outside = (pcx <= b) | (pcx >= w - b) | (pcy <= b) | (pcy >= h - b)
    sx = _unzero(incx)
    sy = _unzero(incy)
    to_add = jnp.where(pcx <= b, (b - pcx) / sx,
                       jnp.where(pcx >= w - b, (w - b - pcx) / sx, 0.0))
    pcx = pcx + to_add * incx
    pcy = pcy + to_add * incy
    to_add = jnp.where(pcy <= b, (b - pcy) / sy,
                       jnp.where(pcy >= h - b, (h - b - pcy) / sy, 0.0))
    pcx = pcx + to_add * incx
    pcy = pcy + to_add * incy
    new_len = jnp.sqrt((pcx - pfx) ** 2 + (pcy - pfy) ** 2)
    ok, code = fail(ok, code,
                    (pcx <= b) | (pcx >= w - b) | (pcy <= b) | (pcy >= h - b)
                    | (was_outside & (new_len < 8.0)), ERR_OOB)

    n_steps = jnp.clip(jnp.floor(new_len + 1e-3).astype(jnp.int32) + 1,
                       1, MAX_STEPS)

    # ---- sample lattice + 5-tap SSD over the masked search window ----
    # patch16 grouped bilinear: lattice spacing is exactly 1 px
    # (|inc| = gradient_sample_dist), so 3 consecutive samples always
    # share a 4x4 patch — one row-gather per TRIPLE instead of per sample
    n_groups = -(-N_SAMPLES // 3)
    ms = (jnp.arange(n_groups * 3, dtype=jnp.float32)
          .reshape(n_groups, 3) - 2.0)                    # (G, 3)
    qx = pfx[..., None, None] + ms * incx[..., None, None]
    qy = pfy[..., None, None] + ms * incy[..., None, None]
    if k_sel is None:
        ref_patch = patch16_pack(ref_img)
        samp = patch16_sample(ref_patch, h, w, qx, qy)    # (..., G, 3)
    else:
        # (K, h, w) stack flattened to one tall (K*h, w) image: a point's
        # rows live at y + k_sel*h. Border masking keeps real samples >= 7
        # px inside their own frame, so 4x4 patches never straddle frames;
        # masked lattice tails may read a neighbor frame's pixels but are
        # discarded by the in_search mask.
        n_ref = ref_img.shape[0]
        ref_patch = patch16_pack(ref_img.reshape(n_ref * h, w))
        y_off = (k_sel * h).astype(jnp.float32)[..., None, None]
        samp = patch16_sample(ref_patch, n_ref * h, w, qx, qy + y_off)
    samp = samp.reshape(samp.shape[:-2] + (n_groups * 3,))[..., :N_SAMPLES]

    ee = jnp.zeros(xs.shape + (MAX_STEPS,), jnp.float32)
    for j in range(5):
        d = samp[..., j:j + MAX_STEPS] - real_vals[..., j:j + 1]
        ee = ee + d * d

    ks_shape = (1,) * xs.ndim + (MAX_STEPS,)
    ks = jnp.arange(MAX_STEPS).reshape(ks_shape)
    in_search = ks < n_steps[..., None]
    ee_m = jnp.where(in_search, ee, jnp.inf)
    best_k = jnp.argmin(ee_m, axis=-1)
    best_err = jnp.take_along_axis(ee_m, best_k[..., None], -1)[..., 0]

    # Ambiguity ("clear enough winner", DepthMap.cpp:1761-1765): the
    # GLOBAL second-best error and its position; reject only when that
    # second-best sits NON-adjacent to the winner AND is too close in
    # error. An adjacent second-best is the normal smooth SSD valley —
    # especially wide at small baselines — and must NOT reject (an earlier
    # version compared against the best non-adjacent error instead, which
    # rejected nearly every create at adjacent-frame baselines and
    # permanently blacklisted the map into starvation).
    not_best = in_search & (ks != best_k[..., None])
    ee_second = jnp.where(not_best, ee, jnp.inf)
    second_k = jnp.argmin(ee_second, axis=-1)
    second_err = jnp.take_along_axis(ee_second, second_k[..., None],
                                     -1)[..., 0]
    second_nonadj = jnp.abs(second_k - best_k) > 1

    ok, code = fail(ok, code, best_err > 4.0 * dcfg.max_error_stereo, ERR_BIG)
    ok, code = fail(ok, code,
                    second_nonadj
                    & (dcfg.min_distance_error_stereo * best_err
                       > second_err),
                    ERR_FAIL)

    # ---- subpixel refinement (DepthMap.cpp:1767-1848) ----
    def errs_at(k):
        idx = jnp.clip(k, 0, MAX_STEPS - 1)
        e = jnp.stack(
            [jnp.take_along_axis(samp, (idx + j)[..., None], -1)[..., 0]
             - real_vals[..., j] for j in range(5)], axis=-1)
        return e  # (h, w, 5) residual vector at step k (samp index k..k+4)

    e_best = errs_at(best_k)
    e_pre = errs_at(best_k - 1)
    e_post = errs_at(best_k + 1)
    err_pre = jnp.sum(e_pre * e_pre, -1)
    err_post = jnp.sum(e_post * e_post, -1)
    cross_pre = jnp.sum(e_best * e_pre, -1)
    cross_post = jnp.sum(e_best * e_post, -1)

    valid_pre = best_k >= 1
    valid_post = (best_k + 1) < n_steps

    grad_pre_pre = -(err_pre - cross_pre)
    grad_pre_this = best_err - cross_pre
    grad_post_this = -(best_err - cross_post)
    grad_post_post = err_post - cross_post

    both_valid = valid_pre & valid_post
    crossing_mid = (grad_post_this < 0) ^ (grad_pre_this < 0)
    crossing_pre = (grad_pre_pre < 0) ^ (grad_pre_this < 0)
    crossing_post = (grad_post_post < 0) ^ (grad_post_this < 0)

    interp_pre = both_valid & ~crossing_mid & crossing_pre & ~crossing_post
    interp_post = (both_valid & ~crossing_mid & ~crossing_pre & crossing_post)

    d_pre = grad_pre_this / _unzero(grad_pre_this - grad_pre_pre)
    d_post = grad_post_this / _unzero(grad_post_this - grad_post_post)

    if use_subpixel:
        sub_off = jnp.where(interp_pre, -d_pre,
                            jnp.where(interp_post, d_post, 0.0))
        did_sub = interp_pre | interp_post
        best_err = jnp.where(
            interp_pre,
            best_err - 2 * d_pre * grad_pre_this
            - (grad_pre_pre - grad_pre_this) * d_pre * d_pre,
            jnp.where(
                interp_post,
                best_err + 2 * d_post * grad_post_this
                + (grad_post_post - grad_post_this) * d_post * d_post,
                best_err))
    else:
        sub_off = jnp.zeros_like(best_err)
        did_sub = jnp.zeros_like(valid_pre)

    pos = best_k.astype(jnp.float32) + sub_off
    best_x = pfx + pos * incx
    best_y = pfy + pos * incy

    # gradient along the searched line in the KF (DepthMap.cpp:1854-1862)
    sample_dist = dcfg.gradient_sample_dist * rescale
    gal = jnp.zeros_like(best_err)
    for j in range(4):
        t = real_vals[..., j + 1] - real_vals[..., j]
        gal = gal + t * t
    gal = gal / jnp.maximum(sample_dist * sample_dist, _DIV_EPS)

    ok, code = fail(ok, code,
                    best_err > dcfg.max_error_stereo + jnp.sqrt(gal) * 20.0,
                    ERR_BIG)

    # ---- triangulate inverse depth in the KF (DepthMap.cpp:1872-1904) ----
    dot0 = (R_k2r[..., 0, 0] * kx + R_k2r[..., 0, 1] * ky
            + R_k2r[..., 0, 2])
    dot1 = (R_k2r[..., 1, 0] * kx + R_k2r[..., 1, 1] * ky
            + R_k2r[..., 1, 2])
    dot2 = (R_k2r[..., 2, 0] * kx + R_k2r[..., 2, 1] * ky
            + R_k2r[..., 2, 2])
    t0_, t1_, t2_ = t_k2r[..., 0], t_k2r[..., 1], t_k2r[..., 2]

    use_x = incx * incx > incy * incy
    old_x = best_x / cam.fx - cam.cx / cam.fx
    old_y = best_y / cam.fy - cam.cy / cam.fy
    nom_x = _unzero(old_x * t2_ - t0_)
    nom_y = _unzero(old_y * t2_ - t1_)
    id_x = (dot0 - old_x * dot2) / nom_x
    id_y = (dot1 - old_y * dot2) / nom_y
    alpha_x = incx / cam.fx * (dot0 * t2_ - dot2 * t0_) / (nom_x * nom_x)
    alpha_y = incy / cam.fy * (dot1 * t2_ - dot2 * t1_) / (nom_y * nom_y)
    idepth_new = jnp.where(use_x, id_x, id_y)
    alpha = jnp.where(use_x, alpha_x, alpha_y)

    if not mcfg.allow_negative_idepths:
        ok, code = fail(ok, code, idepth_new < 0, ERR_FAIL)

    # ---- variance model (DepthMap.cpp:1911-1930) ----
    photo_err = 4.0 * mcfg.camera_pixel_noise2 / (gal + _DIV_EPS)
    geo_dot = kf_gx * epxn + kf_gy * epyn + _DIV_EPS
    geo_err = (tef * tef
               * (kf_gx * kf_gx + kf_gy * kf_gy) / (geo_dot * geo_dot))
    disc = jnp.where(did_sub, 0.05, 0.5) * sample_dist * sample_dist
    result_var = alpha * alpha * (disc + geo_err + photo_err)

    code = jnp.where(ok, OK, code)
    return code, idepth_new, result_var, epl_len, best_err


def observe(state: DepthMapState, kf_img, kf_gx, kf_gy, kf_max_grad,
            ref_img, ref_to_kf, ref_frame_id, good_mask,
            tracking_residual, skip_inc,
            cam: Camera, dcfg: DepthFilterConfig, mcfg: MappingConfig,
            reactivated: bool = False, point_budget: int = 0):
    """One observation sweep against one tracked frame.

    == observeDepthRow create/update dispatch (DepthMap.cpp:105-473) with
    the active semi-dense pixel set compacted to a fixed budget: the cheap
    per-pixel prep (epl checks, priors) runs full-grid, then the expensive
    38-sample EPL search runs only on gathered active points and results
    scatter back. Truncation above the budget is decorrelated across frames
    by a frame-dependent roll, so starved pixels get their turn next sweep.
    Returns (new_state, stats)."""
    h, w = kf_img.shape
    if point_budget <= 0:
        point_budget = max(8192, -(-(h * w) // 6 // 8192) * 8192)
    kf_to_ref = lie.se3_inverse(ref_to_kf)
    t_r2k = ref_to_kf[4:7]

    (epxn, epyn), epl_ok = make_epl(t_r2k, kf_img, cam, dcfg)

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = ((ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3))
    active = interior & (kf_max_grad >= mcfg.min_use_grad) & good_mask

    can_update = state.valid & active
    if not reactivated:
        can_update = can_update & (state.next_min_id <= ref_frame_id)
    can_create = (~state.valid) & active & (state.blacklisted >= dcfg.min_blacklist)

    # priors: update searches prior +- STEREO_EPL_VAR_FAC sigma
    # (DepthMap.cpp:336-341); create searches the full range
    sv = jnp.sqrt(jnp.maximum(state.var_smoothed, 0.0))
    upd_prior = state.idepth_smoothed
    upd_min = jnp.clip(upd_prior - sv * dcfg.stereo_epl_var_fac, 0.0, None)
    upd_max = jnp.minimum(upd_prior + sv * dcfg.stereo_epl_var_fac,
                          1.0 / dcfg.min_depth)
    prior = jnp.where(can_update, upd_prior, 1.0)
    min_id = jnp.where(can_update, upd_min, 0.0)
    max_id = jnp.where(can_update, upd_max, 1.0 / dcfg.min_depth)

    # ---- compact the active set (fixed budget) ----
    n_pix = h * w
    process = (can_update | can_create) & epl_ok
    shift = jnp.mod((ref_frame_id * 37831.0), n_pix).astype(jnp.int32)
    rolled = jnp.roll(process.reshape(-1), shift)
    idx_r = jnp.nonzero(rolled, size=point_budget, fill_value=-1)[0]
    valid_k = idx_r >= 0
    flat_idx = jnp.where(valid_k,
                         jnp.mod(idx_r - shift, n_pix), 0)

    def take(a):
        return a.reshape(-1)[flat_idx]

    xs_k = (flat_idx % w).astype(jnp.float32)
    ys_k = (flat_idx // w).astype(jnp.float32)

    tef = 0.25 * (1.0 + tracking_residual)
    code_k, id_k, var_k, epl_k, _ = line_stereo(
        xs_k, ys_k, take(prior), take(min_id), take(max_id),
        take(epxn), take(epyn), kf_img, take(kf_gx), take(kf_gy), ref_img,
        kf_to_ref, ref_to_kf, tef, cam, dcfg, mcfg,
        mcfg.use_subpixel_stereo)

    # ---- scatter results back to the grid (sentinel code for untouched) ----
    SKIP = jnp.int32(-100)
    tgt = jnp.where(valid_k, flat_idx, n_pix)

    def scatter(vals, fill, dtype=jnp.float32):
        buf = jnp.full((n_pix + 1,), fill, dtype)
        return buf.at[tgt].set(vals)[:n_pix].reshape(h, w)

    code = scatter(code_k, SKIP, jnp.int32)
    r_idepth = scatter(id_k, 0.0)
    r_var = scatter(var_k, 0.0)
    r_epl = scatter(epl_k, 1e9)

    return _fuse_results(state, code, r_idepth, r_var, r_epl, can_update,
                         can_create, epl_ok, kf_max_grad, ref_frame_id,
                         skip_inc, dcfg, process, valid_k)


def _fuse_results(state, code, r_idepth, r_var, r_epl, can_update,
                  can_create, epl_ok, kf_max_grad, ref_id_grid, skip_inc,
                  dcfg, process, valid_k):
    """Create/EKF-update/fail lattice shared by the single- and multi-ref
    observe sweeps (observeDepthCreate / observeDepthUpdate,
    DepthMap.cpp:237-470). ref_id_grid is the observing frame's id — a
    scalar in single-ref mode, per-pixel in multi-ref mode."""
    success = code == OK

    # ---------------- create path (DepthMap.cpp:237-292) ----------------
    create_try = can_create & epl_ok
    create_success = create_try & success & (r_var <= dcfg.max_var)
    create_blacklist = create_try & ((code == ERR_BIG) | (code == ERR_FAIL))

    # ---------------- update path (DepthMap.cpp:344-470) ----------------
    upd_try = can_update & epl_ok
    upd_fail = upd_try & (code == ERR_FAIL)
    diff = r_idepth - state.idepth_smoothed
    inconsistent = (upd_try & success
                    & (dcfg.diff_fac_observe * diff * diff
                       > r_var + state.var_smoothed))
    upd_success = upd_try & success & ~inconsistent

    # EKF fusion (DepthMap.cpp:430-444)
    id_var = state.var * dcfg.succ_var_inc_fac
    wgt = r_var / jnp.maximum(r_var + id_var, _DIV_EPS)
    fused_idepth = _unzero((1.0 - wgt) * r_idepth + wgt * state.idepth)
    fused_var = jnp.minimum(id_var * wgt, state.var)

    validity_cap = (dcfg.validity_counter_max
                    + kf_max_grad * dcfg.validity_counter_max_variable / 255.0)

    new_idepth = jnp.where(create_success, _unzero(r_idepth),
                           jnp.where(upd_success, fused_idepth, state.idepth))
    new_var = jnp.where(create_success, r_var,
                        jnp.where(upd_success, fused_var, state.var))

    # failed update: inflate variance, maybe kill (DepthMap.cpp:369-389,414)
    fail_like = upd_fail | inconsistent
    new_var = jnp.where(fail_like, new_var * dcfg.fail_var_inc_fac, new_var)
    killed = fail_like & (new_var > dcfg.max_var)

    new_valid = (state.valid | create_success) & ~killed
    new_validity = jnp.where(
        create_success, float(dcfg.validity_counter_initial_observe),
        jnp.where(upd_success,
                  jnp.minimum(state.validity + dcfg.validity_counter_inc,
                              validity_cap),
                  jnp.where(upd_fail,
                            jnp.maximum(state.validity
                                        - dcfg.validity_counter_dec, 0.0),
                            state.validity)))
    new_blacklisted = (state.blacklisted
                       - create_blacklist.astype(jnp.int32)
                       - (killed & upd_fail).astype(jnp.int32))

    # adaptive frame skipping for short epls (DepthMap.cpp:447-463)
    short_epl = r_epl < dcfg.min_epl_length_crop
    inc = skip_inc + jnp.mod((r_epl * 10000.0).astype(jnp.int32), 2).astype(jnp.float32)
    inc = jnp.where(r_epl < 0.5 * dcfg.min_epl_length_crop, inc * 3.0, inc)
    new_next_min = jnp.where(upd_success & short_epl, ref_id_grid + inc,
                             jnp.where(upd_fail, 0.0, state.next_min_id))

    new_state = state.replace(
        valid=new_valid,
        idepth=new_idepth,
        var=new_var,
        validity=new_validity,
        blacklisted=new_blacklisted,
        next_min_id=new_next_min,
    )
    stats = dict(
        created=jnp.sum(create_success),
        updated=jnp.sum(upd_success),
        update_failed=jnp.sum(upd_fail),
        inconsistent=jnp.sum(inconsistent),
        killed=jnp.sum(killed),
        oob=jnp.sum((code == ERR_OOB) & (upd_try | create_try)),
        blacklisted=jnp.sum(create_blacklist),
        active=jnp.sum(process),
        processed=jnp.sum(valid_k),
    )
    return new_state, stats


def make_epl_multi(t_r2k_stack, kf_img, cam: Camera, cfg: DepthFilterConfig):
    """Per-frame epipolar directions/validity for a K-stack of reference
    frames: makeAndCheckEPL (DepthMap.cpp:184-234) vectorized over the
    frame axis, with the keyframe gradient computed once."""
    h, w = kf_img.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    tx = t_r2k_stack[:, 0][:, None, None]
    ty = t_r2k_stack[:, 1][:, None, None]
    tz = t_r2k_stack[:, 2][:, None, None]
    epx = -cam.fx * tx + tz * (xs - cam.cx)[None]          # (K, h, w)
    epy = -cam.fy * ty + tz * (ys - cam.cy)[None]
    finite = jnp.isfinite(epx + epy)

    lsq = epx * epx + epy * epy
    ok_len = lsq >= cfg.min_epl_length_squared

    gx = jnp.zeros_like(kf_img).at[:, 1:-1].set(kf_img[:, 2:] - kf_img[:, :-2])
    gy = jnp.zeros_like(kf_img).at[1:-1, :].set(kf_img[2:, :] - kf_img[:-2, :])
    dot = gx[None] * epx + gy[None] * epy
    safe_lsq = jnp.maximum(lsq, _DIV_EPS)
    egs = dot * dot / safe_lsq
    ok_grad = egs >= cfg.min_epl_grad_squared
    ok_angle = (egs / jnp.maximum(gx * gx + gy * gy, _DIV_EPS)[None]
                >= cfg.min_epl_angle_squared)

    fac = cfg.gradient_sample_dist / jnp.sqrt(safe_lsq)
    return (epx * fac, epy * fac), (finite & ok_len & ok_grad & ok_angle)


def observe_multi(state: DepthMapState, kf_img, kf_gx, kf_gy, kf_max_grad,
                  ref_stack, ref_to_kf, ref_ids, good_masks,
                  tracking_residuals, skip_inc,
                  cam: Camera, dcfg: DepthFilterConfig, mcfg: MappingConfig,
                  reactivated: bool = False, point_budget: int = 0):
    """One observation sweep against a QUEUE of tracked frames.

    The TPU equivalent of updateKeyframe draining the whole
    unmappedTrackedFrames deque into one depth update
    (SlamSystem.cpp:542-571; DepthMap::updateKeyframe takes the full
    vector, DepthMap.cpp:1072-1101): each pixel picks its reference frame
    like referenceFrameByID — the oldest queued frame whose id satisfies
    the pixel's nextStereoFrameMinID (DepthMap.cpp:302-319); creation uses
    the oldest frame, reactivated keyframes the newest (DepthMap.cpp:244,
    316). One EPL sweep maps the entire queue, which is what lets the
    mapping thread catch up to free-running tracking.

    ref_stack (K, h, w); ref_to_kf (K, 7); ref_ids (K,) non-decreasing;
    good_masks (K, h, w) bool; tracking_residuals (K,). Padding slots must
    replicate the LAST (newest) frame — selection then never picks them.
    Returns (new_state, stats)."""
    n_ref, h, w = ref_stack.shape
    if point_budget <= 0:
        point_budget = max(8192, -(-(h * w) // 6 // 8192) * 8192)
    kf_to_ref = jax.vmap(lie.se3_inverse)(ref_to_kf)

    (epx_all, epy_all), epl_ok_all = make_epl_multi(
        ref_to_kf[:, 4:7], kf_img, cam, dcfg)

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = ((ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3))
    grad_ok = kf_max_grad >= mcfg.min_use_grad

    # --- per-pixel reference-frame selection (DepthMap.cpp:302-319) ---
    if reactivated:
        k_upd = jnp.full((h, w), n_ref - 1, jnp.int32)
        has_upd = jnp.ones((h, w), bool)
        k_create = n_ref - 1
    else:
        cmp = ref_ids[:, None, None] >= state.next_min_id[None]   # (K,h,w)
        k_upd = jnp.argmax(cmp, axis=0).astype(jnp.int32)
        has_upd = cmp[n_ref - 1]  # newest id >= next_min_id
        k_create = 0
    good_upd = jnp.take_along_axis(good_masks, k_upd[None], axis=0)[0]
    can_update = state.valid & interior & grad_ok & good_upd & has_upd
    can_create = ((~state.valid) & interior & grad_ok
                  & good_masks[k_create]
                  & (state.blacklisted >= dcfg.min_blacklist))
    k_sel_grid = jnp.where(can_update, k_upd, jnp.int32(k_create))
    epl_ok = jnp.take_along_axis(epl_ok_all, k_sel_grid[None], axis=0)[0]

    # priors (same as single-ref observe)
    sv = jnp.sqrt(jnp.maximum(state.var_smoothed, 0.0))
    upd_prior = state.idepth_smoothed
    upd_min = jnp.clip(upd_prior - sv * dcfg.stereo_epl_var_fac, 0.0, None)
    upd_max = jnp.minimum(upd_prior + sv * dcfg.stereo_epl_var_fac,
                          1.0 / dcfg.min_depth)
    prior = jnp.where(can_update, upd_prior, 1.0)
    min_id = jnp.where(can_update, upd_min, 0.0)
    max_id = jnp.where(can_update, upd_max, 1.0 / dcfg.min_depth)

    # ---- compact the active set (fixed budget) ----
    n_pix = h * w
    process = (can_update | can_create) & epl_ok
    shift = jnp.mod((ref_ids[n_ref - 1] * 37831.0), n_pix).astype(jnp.int32)
    rolled = jnp.roll(process.reshape(-1), shift)
    idx_r = jnp.nonzero(rolled, size=point_budget, fill_value=-1)[0]
    valid_k = idx_r >= 0
    flat_idx = jnp.where(valid_k, jnp.mod(idx_r - shift, n_pix), 0)

    def take(a):
        return a.reshape(-1)[flat_idx]

    xs_k = (flat_idx % w).astype(jnp.float32)
    ys_k = (flat_idx // w).astype(jnp.float32)
    k_sel_pt = take(k_sel_grid)
    epx_pt = epx_all.reshape(-1)[k_sel_pt * n_pix + flat_idx]
    epy_pt = epy_all.reshape(-1)[k_sel_pt * n_pix + flat_idx]

    tef = 0.25 * (1.0 + tracking_residuals)                    # (K,)
    code_k, id_k, var_k, epl_k, _ = line_stereo(
        xs_k, ys_k, take(prior), take(min_id), take(max_id),
        epx_pt, epy_pt, kf_img, take(kf_gx), take(kf_gy), ref_stack,
        kf_to_ref, ref_to_kf, tef, cam, dcfg, mcfg,
        mcfg.use_subpixel_stereo, k_sel=k_sel_pt)

    # ---- scatter results back (sentinel code for untouched) ----
    SKIP = jnp.int32(-100)
    tgt = jnp.where(valid_k, flat_idx, n_pix)

    def scatter(vals, fill, dtype=jnp.float32):
        buf = jnp.full((n_pix + 1,), fill, dtype)
        return buf.at[tgt].set(vals)[:n_pix].reshape(h, w)

    code = scatter(code_k, SKIP, jnp.int32)
    r_idepth = scatter(id_k, 0.0)
    r_var = scatter(var_k, 0.0)
    r_epl = scatter(epl_k, 1e9)

    ref_id_grid = ref_ids[k_sel_grid]
    return _fuse_results(state, code, r_idepth, r_var, r_epl, can_update,
                         can_create, epl_ok, kf_max_grad, ref_id_grid,
                         skip_inc, dcfg, process, valid_k)
