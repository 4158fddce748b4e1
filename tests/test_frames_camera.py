"""Golden-value tests for pyramid build and undistortion against plain
NumPy re-implementations of the reference semantics (SURVEY.md section 4
test strategy: kernels vs a NumPy reference)."""

import numpy as np
import jax.numpy as jnp

from lsd_slam_tpu.camera import Camera, undistorter_for_params
from lsd_slam_tpu.frames import build_frame, build_depth_pyramid
from lsd_slam_tpu.utils import synth


def np_box_down2(img):
    h, w = img.shape
    return img.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def test_pyramid_images_match_numpy(rng):
    img = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    pyr = build_frame(jnp.asarray(img), levels=4)
    ref = img
    np.testing.assert_allclose(pyr.images[0], ref, atol=1e-5)
    for l in range(1, 4):
        ref = np_box_down2(ref)
        np.testing.assert_allclose(pyr.images[l], ref, atol=1e-3)
        assert pyr.images[l].shape == (64 >> l, 96 >> l)


def test_gradients_are_central_differences(rng):
    img = rng.uniform(0, 255, (32, 48)).astype(np.float32)
    pyr = build_frame(jnp.asarray(img), levels=1)
    gx = np.asarray(pyr.gx[0])
    gy = np.asarray(pyr.gy[0])
    np.testing.assert_allclose(
        gx[:, 1:-1], 0.5 * (img[:, 2:] - img[:, :-2]), atol=1e-4)
    np.testing.assert_allclose(
        gy[1:-1, :], 0.5 * (img[2:, :] - img[:-2, :]), atol=1e-4)
    assert np.all(gx[:, 0] == 0) and np.all(gx[:, -1] == 0)


def test_max_grad_is_3x3_max(rng):
    img = rng.uniform(0, 255, (32, 48)).astype(np.float32)
    pyr = build_frame(jnp.asarray(img), levels=1)
    gx, gy = np.asarray(pyr.gx[0]), np.asarray(pyr.gy[0])
    mag = np.sqrt(gx * gx + gy * gy)
    mg = np.asarray(pyr.max_grad[0])
    for y in range(2, 30, 5):
        for x in range(2, 46, 7):
            expected = mag[y - 1:y + 2, x - 1:x + 2].max()
            np.testing.assert_allclose(mg[y, x], expected, atol=1e-4)
    assert np.all(mg[0] == 0) and np.all(mg[-1] == 0)


def test_idepth_pyramid_inverse_variance_fusion():
    idepth = np.full((4, 4), -1.0, np.float32)
    ivar = np.full((4, 4), -1.0, np.float32)
    # one 2x2 block: two valid hypotheses with different variances
    idepth[0, 0], ivar[0, 0] = 2.0, 0.1
    idepth[0, 1], ivar[0, 1] = 4.0, 0.2
    pyr = build_depth_pyramid(jnp.asarray(idepth), jnp.asarray(ivar), levels=2)
    iv_sum = 1 / 0.1 + 1 / 0.2
    expect_id = (2.0 / 0.1 + 4.0 / 0.2) / iv_sum
    expect_var = 2 / iv_sum
    np.testing.assert_allclose(pyr.idepth[1][0, 0], expect_id, rtol=1e-5)
    np.testing.assert_allclose(pyr.ivar[1][0, 0], expect_var, rtol=1e-5)
    # empty block stays invalid
    assert pyr.idepth[1][1, 1] == -1.0 and pyr.ivar[1][1, 1] == -1.0


def test_camera_level_intrinsics():
    cam = Camera(fx=400.0, fy=400.0, cx=319.5, cy=239.5, width=640, height=480)
    l1 = cam.level(1)
    assert l1.fx == 200.0 and l1.width == 320
    # Frame.cpp:449-450: cx_l = (cx+0.5)/2^l - 0.5
    np.testing.assert_allclose(l1.cx, (319.5 + 0.5) / 2 - 0.5)
    l3 = cam.level(3)
    np.testing.assert_allclose(l3.cx, (319.5 + 0.5) / 8 - 0.5)
    assert l3.width == 80


def test_fov_undistorter_roundtrip():
    """A point distorted by the FOV model then undistorted lands back."""
    und = undistorter_for_params(
        [0.7, 0.9333, 0.5, 0.5, 0.9], (640, 480), "crop", (640, 480))
    cam = und.camera
    assert cam.width == 640 and cam.fx > 0
    # remap of the output center should be near the input center
    rx = np.asarray(und._rx)
    valid = np.asarray(und._valid)
    assert valid[240, 320]
    assert abs(rx[240, 320] - 320) < 12
    # valid fraction should be high for crop
    assert valid.mean() > 0.95


def test_fov_undistorter_zero_omega_is_identity_scale():
    und = undistorter_for_params(
        [0.7, 0.9333, 0.5, 0.5, 0.0], (640, 480), "crop", (640, 480))
    img = np.random.default_rng(0).uniform(0, 255, (480, 640)).astype(np.float32)
    out = np.asarray(und(img))
    # zero distortion, same size: interior should be ~identical
    np.testing.assert_allclose(out[5:-5, 5:-5], img[5:-5, 5:-5], atol=1e-2)


def test_opencv_undistorter_parses():
    und = undistorter_for_params(
        [0.7, 0.9333, 0.5, 0.5, -0.2, 0.05, 0.0, 0.0],
        (640, 480), "crop", (640, 480))
    img = np.random.default_rng(0).uniform(0, 255, (480, 640)).astype(np.float32)
    out = np.asarray(und(img))
    assert out.shape == (480, 640)
    assert np.isfinite(out).all()


def test_synth_renderer_consistency():
    """Rendered image obeys the GT geometry: reprojecting frame-B pixels
    into frame A via GT depth reproduces frame A's intensity."""
    from lsd_slam_tpu import lie
    cam = synth.default_camera(160, 120)
    scene = synth.PlaneScene(seed=3)
    pose_a = jnp.asarray(np.asarray(
        lie.se3_exp(jnp.asarray([0, 0, 0, 0, 0, 0.0]))))
    pose_b = jnp.asarray(np.asarray(
        lie.se3_exp(jnp.asarray([0.03, -0.01, 0.02, 0.004, 0.008, 0.002]))))
    img_a, dep_a = synth.render(scene, cam, pose_a)
    img_b, dep_b = synth.render(scene, cam, pose_b)
    img_a, dep_a = np.asarray(img_a), np.asarray(dep_a)
    img_b = np.asarray(img_b)

    # unproject a few pixels of A, transform into B, check intensity matches
    b_from_a = lie.se3_mul(pose_b, lie.se3_inverse(pose_a))
    ys, xs = np.mgrid[20:100:13, 20:140:17]
    pts_cam_a = np.stack(
        [(xs - cam.cx) / cam.fx * dep_a[ys, xs],
         (ys - cam.cy) / cam.fy * dep_a[ys, xs],
         dep_a[ys, xs]], axis=-1)
    pts_b = np.asarray(lie.se3_apply(b_from_a, jnp.asarray(pts_cam_a, jnp.float32)))
    u = pts_b[..., 0] / pts_b[..., 2] * cam.fx + cam.cx
    v = pts_b[..., 1] / pts_b[..., 2] * cam.fy + cam.cy
    inb = (u > 1) & (u < 158) & (v > 1) & (v < 118)
    # bilinear sample B
    u0, v0 = np.floor(u).astype(int), np.floor(v).astype(int)
    fu, fv = u - u0, v - v0
    u0c, v0c = np.clip(u0, 0, 158), np.clip(v0, 0, 118)
    sampled = (img_b[v0c, u0c] * (1 - fu) * (1 - fv)
               + img_b[v0c, u0c + 1] * fu * (1 - fv)
               + img_b[v0c + 1, u0c] * (1 - fu) * fv
               + img_b[v0c + 1, u0c + 1] * fu * fv)
    err = np.abs(sampled - img_a[ys, xs])[inb]
    # bilinear interp of a band-limited texture: small but nonzero error
    assert np.median(err) < 2.0, np.median(err)
