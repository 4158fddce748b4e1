"""Analytic synthetic scenes for tests and benchmarks.

The reference is validated by running on the TUM LSD_room sequence
(README.md:18-41); with no dataset available offline, this module provides
the equivalent reproducible harness: a procedurally-textured multi-plane
scene rendered along a known trajectory. Because texture is an analytic
function of the world point (band-limited sum of sinusoids), images at any
pose are exact — no resampling — and ground-truth depth/pose enables ATE
and depth-error metrics without external data.

Convention: poses are world->camera SE3 ("w2c"); depth is the camera-frame
z coordinate; intensities are in [0, 255] like the reference's grayscale.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

from lsd_slam_tpu import lie
from lsd_slam_tpu.camera import Camera


def default_camera(width: int = 640, height: int = 480) -> Camera:
    # FOV-ish intrinsics similar to the reference's example calibs
    return Camera(fx=0.7 * width, fy=0.7 * width, cx=(width - 1) / 2.0,
                  cy=(height - 1) / 2.0, width=width, height=height)


class PlaneScene:
    """A handful of textured planes. Planes: n . p = d (world frame)."""

    def __init__(self, seed: int = 0, n_waves: int = 64, max_freq: float = 40.0,
                 contrast: float = 40.0):
        rng = np.random.default_rng(seed)
        # planes: back wall, floor, ceiling-ish slab, one slanted panel
        normals = np.array(
            [
                [0.0, 0.0, -1.0],   # back wall at z=4 (faces camera at origin)
                [0.0, -1.0, -0.15],  # floor-ish
                [0.0, 1.0, -0.15],   # ceiling-ish
                [-0.55, 0.1, -1.0],  # slanted panel
            ]
        )
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        offsets = np.array([-4.0, -1.6, -1.6, -2.6])
        self.normals = jnp.asarray(normals, jnp.float32)
        self.offsets = jnp.asarray(offsets, jnp.float32)
        # band-limited 3D texture with a 1/f-ish spectrum: low frequencies
        # give the coarse pyramid levels signal, high frequencies give the
        # per-pixel gradients the semi-dense mapper needs (>= minUseGrad).
        dirs = rng.normal(size=(n_waves, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        mags = np.exp(rng.uniform(np.log(0.8), np.log(max_freq), n_waves))
        self.freqs = jnp.asarray(dirs * mags[:, None], jnp.float32)
        self.phases = jnp.asarray(rng.uniform(0, 2 * np.pi, n_waves), jnp.float32)
        amps = mags ** -0.3
        # normalize so the image std is ~contrast (sum a_k^2 / 2 = contrast^2)
        amps *= contrast / np.sqrt(np.sum(amps**2) / 2.0)
        self.amps = jnp.asarray(amps, jnp.float32)
        self.base = 120.0

    def wave(self, p, phase_off=0.0):
        """Raw band-limited wave sum at world points p (..., 3)."""
        phase = (jnp.einsum('...i,wi->...w', p, self.freqs, precision=_HI)
                 + self.phases + jnp.asarray(phase_off)[..., None])
        return jnp.sum(self.amps * jnp.sin(phase), axis=-1)

    def shade(self, t):
        """Map the raw wave to intensity."""
        return self.base + t

    def texture(self, p):
        """Analytic intensity at world points p (..., 3)."""
        return self.shade(self.wave(p))


@functools.partial(jax.jit, static_argnames=("scene", "camera"))
def render(scene: PlaneScene, camera: Camera, pose_w2c):
    """Render image + depth at a world->camera pose (SE3 (7,)).

    Returns (image (H,W) f32 in [0,255], depth (H,W) f32 camera-frame z).
    """
    h, w = camera.height, camera.width
    c2w = lie.se3_inverse(pose_w2c)
    center = c2w[4:7]  # camera center in world
    rot = lie.quat_to_matrix(c2w[0:4])

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    dx = (xs - camera.cx) / camera.fx
    dy = (ys - camera.cy) / camera.fy
    dirs_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)  # z=1
    dirs_world = jnp.einsum('...i,ji->...j', dirs_cam, rot, precision=_HI)

    # intersect all planes: t = (d - n.c) / (n.dir)
    ndir = jnp.einsum('...i,pi->...p', dirs_world, scene.normals, precision=_HI)
    t = (scene.offsets - jnp.einsum('i,pi->p', center, scene.normals, precision=_HI)) / jnp.where(
        jnp.abs(ndir) < 1e-8, 1e-8, ndir)
    t = jnp.where(t > 0.05, t, jnp.inf)
    depth = jnp.min(t, axis=-1)
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)

    points = center + depth[..., None] * dirs_world
    img = scene.texture(points)
    img = jnp.where(depth > 0, img, 0.0)
    return img.astype(jnp.float32), depth.astype(jnp.float32)


def orbit_trajectory(n_frames: int, radius: float = 0.10,
                     fwd: float = 0.012, yaw: float = 0.0015,
                     seed: int = 1) -> np.ndarray:
    """A smooth sideways-arc trajectory with small rotations (n, 7) w2c.

    Motion magnitudes mimic a handheld 30fps camera: ~1cm/frame translation,
    milliradian rotations — the regime the reference's tracker is tuned for.
    """
    poses = []
    for i in range(n_frames):
        a = i / max(n_frames - 1, 1)
        # camera center moves along a lateral arc, slightly forward
        cx = radius * np.sin(2 * np.pi * a * 0.75)
        cy = 0.3 * radius * np.sin(2 * np.pi * a * 1.5)
        cz = fwd * i
        yaw_i = yaw * i * 15
        pitch_i = 0.3 * yaw * i * 7
        t_c2w = np.array([cx, cy, cz])
        tangent = np.array([0, 0, 0, pitch_i, yaw_i, 0.0], dtype=np.float32)
        q = np.asarray(lie.se3_exp(jnp.asarray(tangent)))[0:4]
        c2w = np.concatenate([q, t_c2w]).astype(np.float32)
        poses.append(np.asarray(lie.se3_inverse(jnp.asarray(c2w))))
    return np.stack(poses)


def loop_trajectory(n_frames: int, span: float = 0.55,
                    yaw_amp: float = 0.06) -> np.ndarray:
    """Out-and-back loop-closing trajectory (n, 7) w2c: the camera slides
    right and returns, so late frames revisit early views — drift
    accumulated on the way out is observable as loop-closure error."""
    poses = []
    for i in range(n_frames):
        a = i / max(n_frames - 1, 1)
        x = span * np.sin(np.pi * a)
        yaw = yaw_amp * np.sin(2 * np.pi * a)
        t = np.asarray(lie.se3_exp(jnp.asarray(
            [0, 0, 0, 0, yaw, 0], jnp.float32)))
        c2w = np.concatenate(
            [t[0:4], [x, 0.0, 0.015 * np.sin(np.pi * a)]]).astype(np.float32)
        poses.append(np.asarray(lie.se3_inverse(jnp.asarray(c2w))))
    return np.stack(poses)


def make_sequence(n_frames: int = 30, width: int = 320, height: int = 240,
                  seed: int = 0):
    """Convenience: (camera, images[n,h,w], depths[n,h,w], poses_w2c[n,7])."""
    cam = default_camera(width, height)
    scene = PlaneScene(seed=seed)
    poses = orbit_trajectory(n_frames)
    imgs, deps = [], []
    for i in range(n_frames):
        img, dep = render(scene, cam, jnp.asarray(poses[i]))
        imgs.append(np.asarray(img))
        deps.append(np.asarray(dep))
    return cam, np.stack(imgs), np.stack(deps), poses


class BenchScene(PlaneScene):
    """PlaneScene plus bounded foreground occluder panels.

    The infinite-plane scene is too easy: no occlusion boundaries, no
    parallax discontinuities — the regimes where the reference's depth
    filter earns its occlusion handling (propagateDepth occlusion resolve,
    DepthMap.cpp:583-603) and where real monocular drift comes from. The
    panels are finite textured slabs floating in front of the back wall."""

    def __init__(self, seed: int = 0, **kw):
        # Finer, denser texture than the default PlaneScene: wavelengths
        # down to ~5 cm keep far/oblique surfaces (side walls at 2-4 m)
        # above the semi-dense gradient threshold — with the default
        # 16 cm minimum the image goes nearly flat at the sweep's yaw
        # extremes (observed: 45 pixels with |grad|>=10 in a whole frame).
        kw.setdefault("n_waves", 96)
        kw.setdefault("max_freq", 120.0)
        kw.setdefault("contrast", 45.0)
        super().__init__(seed=seed, **kw)
        # Enclose the room: side walls and a behind-wall so every ray hits
        # texture at every pose of the bench sweep (the open PlaneScene
        # renders VOID at yaw extremes, which collapses the photometric
        # residual and fakes a tracking loss).
        extra_n = np.array([
            [-1.0, 0.0, 0.0],   # wall at x = +3.2
            [1.0, 0.0, 0.0],    # wall at x = -3.2
            [0.0, 0.0, 1.0],    # wall behind the start at z = -2.5
        ])
        extra_d = np.array([-3.2, -3.2, -2.5])
        self.normals = jnp.concatenate(
            [self.normals, jnp.asarray(extra_n, jnp.float32)])
        self.offsets = jnp.concatenate(
            [self.offsets, jnp.asarray(extra_d, jnp.float32)])
        # panel centers / normals (facing camera-ish) / in-plane half sizes
        self.panel_c = jnp.asarray(
            [[-0.9, 0.15, 2.2],
             [0.95, -0.25, 2.7],
             [0.1, 0.45, 1.8]], jnp.float32)
        n = np.array([[0.25, 0.0, -1.0],
                      [-0.2, 0.1, -1.0],
                      [0.05, -0.3, -1.0]])
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        self.panel_n = jnp.asarray(n, jnp.float32)
        # in-plane axes: u = normalize(cross(n, up)), v = cross(n, u)
        up = np.array([0.0, 1.0, 0.0])
        u = np.cross(n, up)
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        v = np.cross(n, u)
        self.panel_u = jnp.asarray(u, jnp.float32)
        self.panel_v = jnp.asarray(v, jnp.float32)
        self.panel_hu = jnp.asarray([0.45, 0.4, 0.35], jnp.float32)
        self.panel_hv = jnp.asarray([0.6, 0.5, 0.3], jnp.float32)
        # texture phase offset so panels are visually distinct from the
        # background they occlude
        self.panel_phase = jnp.asarray([1.7, 3.1, 4.6], jnp.float32)

    def shade(self, t):
        # Edge-rich shading: the raw 1/f wave sum leaves a large pixel
        # mass hovering AT the semi-dense gradient threshold, so the
        # max-grad >= minUseGrad set churns frame-to-frame under sensor
        # noise and keyframe propagation bleeds ~half its points at every
        # switch (dest-grad gating, DepthMap.cpp:548-570). Real images
        # are piecewise-smooth with strong edges — a soft-threshold tanh
        # reproduces that: plateaus (clearly below threshold) separated
        # by sharp transitions (clearly above), i.e. a bimodal gradient
        # histogram that is STABLE across frames.
        s = 24.0
        return self.base + 0.35 * t + 0.95 * s * jnp.tanh(t * (2.5 / s))


@functools.partial(jax.jit, static_argnames=("scene", "camera"))
def render_bench(scene: BenchScene, camera: Camera, pose_w2c):
    """Render BenchScene: background planes + bounded occluder panels."""
    h, w = camera.height, camera.width
    c2w = lie.se3_inverse(pose_w2c)
    center = c2w[4:7]
    rot = lie.quat_to_matrix(c2w[0:4])

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    dx = (xs - camera.cx) / camera.fx
    dy = (ys - camera.cy) / camera.fy
    dirs_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)
    dirs_world = jnp.einsum('...i,ji->...j', dirs_cam, rot, precision=_HI)

    # background: infinite planes
    ndir = jnp.einsum('...i,pi->...p', dirs_world, scene.normals,
                      precision=_HI)
    t = (scene.offsets - jnp.einsum('i,pi->p', center, scene.normals,
                                    precision=_HI)) / jnp.where(
        jnp.abs(ndir) < 1e-8, 1e-8, ndir)
    t = jnp.where(t > 0.05, t, jnp.inf)
    t_bg = jnp.min(t, axis=-1)

    # panels: plane intersection gated by in-plane extent
    pn, pc = scene.panel_n, scene.panel_c
    ndp = jnp.einsum('...i,pi->...p', dirs_world, pn, precision=_HI)
    dpl = jnp.einsum('pi,pi->p', pc, pn, precision=_HI)
    tp = (dpl - jnp.einsum('i,pi->p', center, pn, precision=_HI)) / \
        jnp.where(jnp.abs(ndp) < 1e-8, 1e-8, ndp)
    hit = center + tp[..., None] * dirs_world[..., None, :]  # (h,w,P,3)
    rel = hit - pc
    uu = jnp.einsum('...pi,pi->...p', rel, scene.panel_u, precision=_HI)
    vv = jnp.einsum('...pi,pi->...p', rel, scene.panel_v, precision=_HI)
    inside = ((jnp.abs(uu) < scene.panel_hu)
              & (jnp.abs(vv) < scene.panel_hv) & (tp > 0.05))
    tp = jnp.where(inside, tp, jnp.inf)
    t_panel = jnp.min(tp, axis=-1)
    panel_id = jnp.argmin(tp, axis=-1)

    use_panel = t_panel < t_bg
    depth = jnp.where(use_panel, t_panel, t_bg)
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    points = center + depth[..., None] * dirs_world
    phase_off = jnp.where(use_panel, scene.panel_phase[panel_id], 0.0)
    img = scene.shade(scene.wave(points, phase_off))
    img = jnp.where(depth > 0, img, 0.0)
    return img.astype(jnp.float32), depth.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("scene", "camera"))
def render_realistic(scene: PlaneScene, camera: Camera, pose_w2c,
                     frame_index=0, noise_sigma=1.5):
    """Render + camera realism (the bench's stated proxy for a real
    sensor — no real dataset is fetchable in this environment, so the
    known photometric nuisances are modeled explicitly):
      * smooth per-frame exposure drift — gain and bias (exercises the
        affine lighting estimation, settings.cpp
        useAffineLightningEstimation) plus a mild ROLLING component that
        varies top-to-bottom within a frame (rolling-shutter-style
        exposure gradient);
      * radial vignetting (~12% corner falloff, fixed across frames —
        uncompensated like the reference's non-photometrically-calibrated
        input);
      * slight optical blur (3x3 binomial kernel, ~0.5 px sigma);
      * additive Gaussian sensor noise (cameraPixelNoise2 models sigma=4
        gray levels; real sensors at good light sit around 1-2).
    Deterministic per frame_index."""
    if isinstance(scene, BenchScene):
        img, depth = render_bench(scene, camera, pose_w2c)
    else:
        img, depth = render(scene, camera, pose_w2c)
    h, w = img.shape
    i = jnp.asarray(frame_index, jnp.float32)
    # slight optical blur before the sensor effects (separable binomial)
    k = jnp.asarray([0.25, 0.5, 0.25], jnp.float32)
    blurred = img
    blurred = (jnp.pad(blurred, ((0, 0), (1, 1)), mode="edge")[:, :-2] * k[0]
               + blurred * k[1]
               + jnp.pad(blurred, ((0, 0), (1, 1)), mode="edge")[:, 2:] * k[2])
    blurred = (jnp.pad(blurred, ((1, 1), (0, 0)), mode="edge")[:-2, :] * k[0]
               + blurred * k[1]
               + jnp.pad(blurred, ((1, 1), (0, 0)), mode="edge")[2:, :] * k[2])
    img = blurred
    # vignette: radial cos^4-style falloff, ~12% at the corners
    ys = (jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2) / (h / 2)
    xs = (jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2) / (w / 2)
    r2 = (ys[:, None] ** 2 + xs[None, :] ** 2) / 2.0
    vignette = 1.0 - 0.12 * r2
    gain = 1.0 + 0.06 * jnp.sin(0.21 * i) + 0.02 * jnp.sin(0.047 * i)
    # rolling exposure: the gain drifts slightly across scanlines within
    # one frame (top rows "earlier" than bottom rows)
    rolling = 1.0 + 0.01 * jnp.sin(0.21 * i + 0.9) \
        * (ys[:, None] * jnp.ones((1, w)))
    bias = 3.0 * jnp.sin(0.13 * i)
    key = jax.random.fold_in(jax.random.PRNGKey(1234),
                             jnp.asarray(frame_index, jnp.int32))
    noise = jnp.asarray(noise_sigma, jnp.float32) * jax.random.normal(
        key, img.shape, jnp.float32)
    out = jnp.clip(gain * rolling * vignette * img + bias + noise,
                   0.0, 255.0)
    out = jnp.where(depth > 0, out, 0.0)
    return out.astype(jnp.float32), depth


def bench_trajectory(n_frames: int, span: float = 1.8,
                     yaw_amp: float = 0.75, seed: int = 2) -> np.ndarray:
    """Reference-scale out-and-back loop (n, 7) w2c: a wide lateral sweep
    with a +-~25 deg yaw pan and gentle bobbing. Sized so a 300-frame run
    at 640x480 produces reference-like keyframe cadence (a keyframe every
    few dozen frames, SlamSystem.cpp:996-1020) and accumulates measurable
    monocular drift on the way out that loop closure must remove."""
    rng = np.random.default_rng(seed)
    # small smooth handheld jitter on top of the sweep
    n_j = 6
    jf = rng.uniform(2.0, 9.0, (n_j, 3))
    jp = rng.uniform(0, 2 * np.pi, (n_j, 3))
    ja = rng.uniform(0.002, 0.008, (n_j, 3)) / np.arange(1, n_j + 1)[:, None]
    poses = []
    for i in range(n_frames):
        a = i / max(n_frames - 1, 1)
        # The sweep is SYMMETRIC in time (every term a function of
        # sin(pi*a)): the return leg passes through the same poses and
        # VIEWING DIRECTIONS as the outbound leg, so revisits genuinely
        # overlap — with antisymmetric yaw/z terms (an earlier version)
        # the camera re-crossed the same positions looking ~38 deg away
        # and the loop could never close (view-cone rejection is then the
        # CORRECT behavior, TrackableKeyFrameSearch.cpp:56-98).
        sa = np.sin(np.pi * a)
        jitter = np.sum(ja * np.sin(jf * a * 2 * np.pi + jp), axis=0)
        x = span * sa
        z = 0.45 * sa * sa
        y = 0.05 * sa * sa + jitter[2] * 2.0
        yaw = yaw_amp * sa + jitter[0]       # pan along the sweep
        pitch = 0.06 * sa + jitter[1]
        roll = 0.04 * sa * jitter[2] * 10.0
        t = np.asarray(lie.se3_exp(jnp.asarray(
            [0, 0, 0, pitch, yaw, roll], jnp.float32)))
        c2w = np.concatenate([t[0:4], [x, y, z]]).astype(np.float32)
        poses.append(np.asarray(lie.se3_inverse(jnp.asarray(c2w))))
    return np.stack(poses)
