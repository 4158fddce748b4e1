"""Appearance retrieval (FabMap slot): rotation/scale-invariant revisit
detection via the rotation-marginalized tiled descriptor, and candidate
discovery through the appearance path when Euclidean search cannot fire."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsd_slam_tpu import lie
from lsd_slam_tpu.frames import build_frame
from lsd_slam_tpu.mapping.appearance import AppearanceIndex
from lsd_slam_tpu.utils import synth

W, H = 160, 128


@pytest.fixture(scope="module")
def world():
    cam = synth.default_camera(W, H)
    scene = synth.PlaneScene(seed=3)

    def pyr_at(x, roll=0.0, z=0.0):
        c2w = np.asarray(lie.se3_mul(
            lie.se3_exp(jnp.asarray([x, 0, z, 0, 0, 0], jnp.float32)),
            lie.se3_exp(jnp.asarray([0, 0, 0, 0, 0, roll], jnp.float32))))
        w2c = np.asarray(lie.se3_inverse(jnp.asarray(c2w, jnp.float32)))
        img, dep = synth.render(scene, cam, jnp.asarray(w2c))
        return build_frame(img, 5), np.asarray(img), np.asarray(dep)

    return cam, pyr_at


PLACES = [0.0, 0.35, 0.7, 1.05, 1.4, 1.75]


def test_retrieval_invariant_to_roll_and_scale(world):
    """Revisits under a 20-degree camera roll AND a forward scale change
    must retrieve the correct place for every place — beyond what the
    reference's FabMap needs (Star/SURF is rotation invariant; our
    marginalized matching must match that)."""
    cam, pyr_at = world
    index = AppearanceIndex()
    for k, x in enumerate(PLACES):
        index.add(k * 100, pyr_at(x)[0])
    for k, x in enumerate(PLACES):
        got = index.query(pyr_at(x, roll=0.35, z=0.06)[0], query_id=9999)
        assert got == k * 100, (k, got)


def test_retrieval_rejects_novel_place(world):
    cam, pyr_at = world
    index = AppearanceIndex()
    for k, x in enumerate(PLACES):
        index.add(k * 100, pyr_at(x)[0])
    assert index.query(pyr_at(6.0)[0], query_id=9999) is None


def test_retrieval_excludes_temporal_neighbors(world):
    """Appearance matches of the immediate past are not loop closures."""
    cam, pyr_at = world
    index = AppearanceIndex()
    index.add(0, pyr_at(0.0)[0])
    index.add(4, pyr_at(0.05)[0])
    # query id adjacent to both -> excluded -> no match
    assert index.query(pyr_at(0.0)[0], query_id=8) is None


def test_appearance_path_finds_candidate_when_euclidean_cannot(world):
    """Integration: find_candidates must surface the appearance hit (plus
    its graph neighbors) even when the query keyframe's POSE has drifted
    so far that Euclidean overlap search returns nothing — the scenario
    FabMap exists for (TrackableKeyFrameSearch.cpp:174-203)."""
    import dataclasses
    from lsd_slam_tpu.config import LSDConfig
    from lsd_slam_tpu.system import SlamSystem
    from lsd_slam_tpu.system.keyframe import Keyframe
    from lsd_slam_tpu.system.poses import PoseNode

    cam, pyr_at = world
    cfg = LSDConfig(width=W, height=H)
    cfg = cfg.replace(system=dataclasses.replace(cfg.system,
                                                 use_fabmap=True))
    sys = SlamSystem(cam, cfg, enable_slam=True)
    graph = sys.backend.graph
    assert graph.appearance is not None

    # register "places" as keyframes of the graph (ids spaced so the
    # temporal-neighbor exclusion cannot mask the revisit)
    for k, x in enumerate(PLACES):
        pyr, img, dep = pyr_at(x)
        node = PoseNode(k * 100, sys.registry)
        node.this_to_parent = np.array([1, 0, 0, 0, x, 0, 0, 1.0])
        kf = Keyframe(k * 100, 0.0, pyr, node, 5)
        sys.map.initialize_from_gt(
            jnp.asarray(1.0 / np.maximum(dep, 1e-6)), pyr.max_grad[0])
        sys._export_depth_to(kf)
        kf.idx_in_keyframes = k
        sys.keyframes.append(kf)
        sys.id_to_keyframe[kf.id] = kf
        graph.add_keyframe(kf)

    # query keyframe: revisit of place 2 under roll, but with a pose
    # parked 100 units away -> Euclidean overlap finds nothing
    pyr, img, dep = pyr_at(PLACES[2], roll=0.3)
    node = PoseNode(9999, sys.registry)
    node.this_to_parent = np.array([1, 0, 0, 0, 100.0, 100.0, 0, 1.0])
    query = Keyframe(9999, 0.0, pyr, node, 5)
    query.mean_idepth = 1.0

    euclid = graph.find_euclidean_overlap_frames(
        node.this_to_parent, 1.0, 15.0 / 16.0, 0.75, True)
    assert euclid == []
    cands, fabmap_id = graph.find_candidates(query, 1.0)
    assert fabmap_id == 200, (fabmap_id, sorted(cands))
    assert 200 in cands


def test_index_scales_to_200_keyframes():
    """Scale pass (reference envelope is ~1000 KFs, README.md:313-314):
    adds are incremental (device row-set into a padded buffer, no O(N*D)
    rebuild), capacity growth is transparent, and a query against 200
    keyframes is one fused dispatch returning the right place."""
    import time as _time

    class FakePyr:
        def __init__(self, img):
            g = np.gradient(img)
            self.images = {2: jnp.asarray(img)}
            self.gx = {2: jnp.asarray(g[1] * 2)}
            self.gy = {2: jnp.asarray(g[0] * 2)}

    rng = np.random.default_rng(0)
    h, w = 32, 40
    base = [rng.uniform(0, 255, (h, w)).astype(np.float32)
            for _ in range(200)]
    # smooth them so gradients behave
    def smooth(a):
        return (a + np.roll(a, 1, 0) + np.roll(a, 1, 1)
                + np.roll(a, -1, 0) + np.roll(a, -1, 1)) / 5.0
    base = [smooth(smooth(b)) for b in base]

    index = AppearanceIndex(level=2)
    t0 = _time.perf_counter()
    for k in range(200):
        index.add(k * 10, FakePyr(base[k]))
    add_s = _time.perf_counter() - t0
    assert len(index) == 200
    assert index._capacity >= 200 and index._mat.shape[0] == index._capacity

    # query: a noisy revisit of place 30 (far outside the temporal window)
    q = FakePyr(base[30] + rng.normal(0, 2.0, (h, w)).astype(np.float32))
    t0 = _time.perf_counter()
    got = index.query(q, query_id=10_000)
    q_s = _time.perf_counter() - t0
    assert got == 300, got
    # one more query to measure the hot path (first may compile)
    t0 = _time.perf_counter()
    assert index.query(q, query_id=10_000) == 300
    q_hot_s = _time.perf_counter() - t0
    print(f"appearance scale: 200 adds {add_s:.2f}s, "
          f"query {q_s*1e3:.1f}ms (hot {q_hot_s*1e3:.1f}ms)")
    assert q_hot_s < 5.0
