"""SE3 tracker tests: golden single-pass values vs a plain NumPy port of the
reference math (SE3Tracker.cpp:749-790, 885-1029, 1258-1299), and
end-to-end convergence on rendered image pairs with GT depth."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsd_slam_tpu import lie
from lsd_slam_tpu.config import TrackerConfig
from lsd_slam_tpu.frames import build_frame, build_depth_pyramid
from lsd_slam_tpu.tracking import SE3Tracker, make_tracking_ref
from lsd_slam_tpu.tracking.se3_tracker import (
    _residual_pass, _weights_pass, _normal_equations)
from lsd_slam_tpu.utils import synth

W, H = 160, 128


@pytest.fixture(scope="module")
def pair():
    cam = synth.default_camera(W, H)
    scene = synth.PlaneScene(seed=5)
    pose_a = jnp.asarray([1, 0, 0, 0, 0, 0, 0], jnp.float32)
    tangent_ba = np.array([0.02, -0.012, 0.015, 0.006, -0.01, 0.004], np.float32)
    pose_b = lie.se3_mul(lie.se3_exp(jnp.asarray(tangent_ba)), pose_a)
    img_a, dep_a = synth.render(scene, cam, pose_a)
    img_b, dep_b = synth.render(scene, cam, pose_b)
    return cam, np.asarray(img_a), np.asarray(dep_a), np.asarray(img_b), tangent_ba


def make_ref(cam, img, dep, var=0.001):
    idepth = 1.0 / np.maximum(dep, 1e-6)
    ivar = np.full_like(dep, var)
    pyr = build_frame(jnp.asarray(img), levels=5)
    dpyr = build_depth_pyramid(jnp.asarray(idepth), jnp.asarray(ivar), levels=5)
    return make_tracking_ref(pyr, dpyr)


def numpy_reference_pass(cam, ref_img, idepth, ivar, img_b, pose_r2f,
                         sigma2=16.0, huber_d=3.0):
    """Straight NumPy implementation of one residual+weights+LGS6 pass."""
    h, w = ref_img.shape
    gx_b = np.zeros_like(img_b)
    gy_b = np.zeros_like(img_b)
    gx_b[:, 1:-1] = 0.5 * (img_b[:, 2:] - img_b[:, :-2])
    gy_b[1:-1, :] = 0.5 * (img_b[2:, :] - img_b[:-2, :])

    R = np.asarray(lie.quat_to_matrix(jnp.asarray(pose_r2f[0:4])), np.float64)
    t = np.asarray(pose_r2f[4:7], np.float64)

    A = np.zeros((6, 6))
    g = np.zeros(6)
    err_sum, n_in = 0.0, 0
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            d = idepth[y, x]
            if ivar[y, x] <= 0 or d == 0:
                continue
            P = np.array([(x - cam.cx) / cam.fx / d, (y - cam.cy) / cam.fy / d,
                          1.0 / d])
            Wp = R @ P + t
            u = Wp[0] / Wp[2] * cam.fx + cam.cx
            v = Wp[1] / Wp[2] * cam.fy + cam.cy
            if not (u > 1 and v > 1 and u < w - 2 and v < h - 2):
                continue
            u0, v0 = int(u), int(v)
            fu, fv = u - u0, v - v0

            def interp(im):
                return (im[v0, u0] * (1 - fu) * (1 - fv)
                        + im[v0, u0 + 1] * fu * (1 - fv)
                        + im[v0 + 1, u0] * (1 - fu) * fv
                        + im[v0 + 1, u0 + 1] * fu * fv)

            c2 = interp(img_b)
            gxn = interp(gx_b) * cam.fx
            gyn = interp(gy_b) * cam.fy
            r = ref_img[y, x] - c2
            # weights (SE3Tracker.cpp:763-785)
            g0 = (t[0] * Wp[2] - t[2] * Wp[0]) / (Wp[2] * Wp[2] * d)
            g1 = (t[1] * Wp[2] - t[2] * Wp[1]) / (Wp[2] * Wp[2] * d)
            drpdd = gxn * g0 + gyn * g1
            w_p = 1.0 / (sigma2 + ivar[y, x] * drpdd * drpdd)
            wrp = abs(r) * np.sqrt(w_p)
            wh = 1.0 if wrp < huber_d / 2 else (huber_d / 2) / wrp
            weight = wh * w_p
            err_sum += weight * r * r
            n_in += 1
            # LGS6 (SE3Tracker.cpp:1276-1291)
            z = 1.0 / Wp[2]
            z2 = z * z
            J = np.array([
                z * gxn,
                z * gyn,
                -Wp[0] * z2 * gxn - Wp[1] * z2 * gyn,
                -Wp[0] * Wp[1] * z2 * gxn - (1 + Wp[1] * Wp[1] * z2) * gyn,
                (1 + Wp[0] * Wp[0] * z2) * gxn + Wp[0] * Wp[1] * z2 * gyn,
                -Wp[1] * z * gxn + Wp[0] * z * gyn,
            ])
            A += weight * np.outer(J, J)
            g += weight * r * J
    return A / n_in, g / n_in, err_sum / n_in, n_in


def test_single_pass_matches_numpy(pair):
    cam, img_a, dep_a, img_b, tangent = pair
    idepth = (1.0 / np.maximum(dep_a, 1e-6)).astype(np.float32)
    ivar = np.full_like(idepth, 0.001)

    # small pose offset so residuals are non-trivial
    pose = np.asarray(lie.se3_exp(jnp.asarray(
        [0.01, -0.005, 0.008, 0.002, -0.004, 0.001], jnp.float32)))

    pyr_a = build_frame(jnp.asarray(img_a), levels=1)
    pyr_b = build_frame(jnp.asarray(img_b), levels=1)
    dpyr = build_depth_pyramid(jnp.asarray(idepth), jnp.asarray(ivar),
                               levels=1)
    cfg = TrackerConfig()
    # full-grid budget: the compaction is the identity, so the pass covers
    # exactly the pixels the NumPy golden loop covers
    ref = make_tracking_ref(pyr_a, dpyr, budget_frac=(1.0,))

    buffers, stats = _residual_pass(
        jnp.asarray(pose), jnp.float32(1.0), jnp.float32(0.0),
        ref.pts[0], pyr_b.quad[0], cam, cfg)
    weight, error = _weights_pass(jnp.asarray(pose), buffers, cfg, 16.0)
    A, g = _normal_equations(buffers, weight)

    A_np, g_np, err_np, n_np = numpy_reference_pass(
        cam, img_a, idepth, ivar, img_b, pose)

    assert abs(int(jnp.sum(buffers["mask"])) - n_np) <= 2
    np.testing.assert_allclose(float(error), err_np, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(A), A_np, rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g), g_np, rtol=5e-3,
                               atol=5e-3 * np.abs(g_np).max())


def test_tracker_converges_to_gt(pair):
    cam, img_a, dep_a, img_b, tangent_ba = pair
    ref = make_ref(cam, img_a, dep_a)
    pyr_b = build_frame(jnp.asarray(img_b), levels=5)
    tracker = SE3Tracker(cam)

    res = tracker.track(ref, pyr_b, lie.se3_identity())
    assert bool(res.tracking_good)
    assert not bool(res.diverged)
    # ref_to_frame should equal the GT b-from-a transform
    err = lie.se3_log(lie.se3_mul(res.ref_to_frame,
                                  lie.se3_inverse(lie.se3_exp(jnp.asarray(tangent_ba)))))
    err = np.asarray(err)
    assert np.linalg.norm(err[:3]) < 5e-3, err   # translation (scene scale ~3m)
    assert np.linalg.norm(err[3:]) < 2e-3, err   # rotation rad


def test_tracker_identity_pair(pair):
    cam, img_a, dep_a, _, _ = pair
    ref = make_ref(cam, img_a, dep_a)
    pyr_a = build_frame(jnp.asarray(img_a), levels=5)
    tracker = SE3Tracker(cam)
    res = tracker.track(ref, pyr_a, lie.se3_identity())
    err = np.asarray(lie.se3_log(res.ref_to_frame))
    assert np.linalg.norm(err) < 1e-4, err
    assert bool(res.tracking_good)
    assert float(res.point_usage) > 0.9


def test_tracker_diverges_on_unrelated_image(pair):
    cam, img_a, dep_a, _, _ = pair
    ref = make_ref(cam, img_a, dep_a)
    # unrelated high-contrast content: residual magnitudes blow past the
    # good-pixel threshold (MAX_DIFF_CONSTANT = 40^2, settings.h:168) on
    # most pixels -> good/(good+bad) < 50% -> loss detected
    # (SE3Tracker.cpp:475-477). Mild-contrast unrelated textures can
    # accidentally stay within |r|<40, hence the cranked contrast.
    scene2 = synth.PlaneScene(seed=99, contrast=95.0)
    far_pose = lie.se3_exp(jnp.asarray([3.0, 2.0, -1.0, 0.5, 1.2, 0.3]))
    img_c, _ = synth.render(scene2, cam, far_pose)
    pyr_c = build_frame(img_c, levels=5)
    tracker = SE3Tracker(cam)
    res = tracker.track(ref, pyr_c, lie.se3_identity())
    # must not report good tracking on garbage
    assert not bool(res.tracking_good)


def test_tracker_affine_lighting(pair):
    """Brightness-transformed target should still track (a*I+b estimation,
    SE3Tracker.cpp:952-961)."""
    cam, img_a, dep_a, img_b, tangent_ba = pair
    ref = make_ref(cam, img_a, dep_a)
    img_b2 = np.clip(img_b * 1.25 - 18.0, 0, 255).astype(np.float32)
    pyr_b = build_frame(jnp.asarray(img_b2), levels=5)
    tracker = SE3Tracker(cam)
    res = tracker.track(ref, pyr_b, lie.se3_identity())
    assert bool(res.tracking_good)
    err = lie.se3_log(lie.se3_mul(res.ref_to_frame,
                                  lie.se3_inverse(lie.se3_exp(jnp.asarray(tangent_ba)))))
    assert np.linalg.norm(np.asarray(err)[:3]) < 5e-3
    # estimated affine gain should approximate 1/1.25 (ref -> new mapping)
    # c1 = a*I_ref + b approximates I_new = 1.25*I_ref - 18
    assert 1.1 < float(res.affine_a) < 1.4
