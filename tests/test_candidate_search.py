"""Vectorized Euclidean candidate search: equivalence with the per-keyframe
loop (TrackableKeyFrameSearch.cpp:56-98) and the large-map time budget."""

import math
import time
from types import SimpleNamespace

import numpy as np
import pytest

from lsd_slam_tpu.config import LSDConfig
from lsd_slam_tpu.lie import np_sim3 as nps
from lsd_slam_tpu.system.poses import PoseRegistry, PoseNode
from lsd_slam_tpu.utils import synth

W, H = 160, 128


def _fake_system(n_kf, seed=0):
    rng = np.random.default_rng(seed)
    registry = PoseRegistry()
    keyframes = []
    for i in range(n_kf):
        node = PoseNode(i, registry)
        q = rng.normal(size=4)
        q[0] = abs(q[0]) + 2.0  # small rotations
        q /= np.linalg.norm(q)
        t = rng.normal(scale=0.5, size=3)
        s = np.exp(rng.normal(scale=0.1))
        node.this_to_parent = np.concatenate([q, t, [s]])
        kf = SimpleNamespace(id=i, pose=node,
                             mean_idepth=float(np.exp(rng.normal(scale=0.2))),
                             idx_in_keyframes=i)
        keyframes.append(kf)
    cam = synth.default_camera(W, H)
    sys = SimpleNamespace(cam=cam, cfg=LSDConfig(width=W, height=H),
                          keyframes=keyframes, registry=registry,
                          id_to_keyframe={kf.id: kf for kf in keyframes})
    return sys


def _make_graph(sys):
    from lsd_slam_tpu.mapping.keyframe_graph import KeyFrameGraph
    return KeyFrameGraph(sys)


def _loop_reference(graph, frame_c2w, mean_idepth, distance_th, angle_th,
                    check_both_scales):
    """The original serial implementation, kept as the oracle."""
    cos_angle_th = math.cos(angle_th * 0.5 * (graph.fow_x + graph.fow_y))
    pos = frame_c2w[4:7]
    view = nps.quat_to_matrix(frame_c2w[0:4])[:, 2]
    dist_fac_recip = mean_idepth / frame_c2w[7]
    out = []
    for kf in graph.system.keyframes:
        c2w = kf.pose.cam_to_world()
        dist_fac = kf.mean_idepth / c2w[7]
        if check_both_scales and dist_fac_recip < dist_fac:
            dist_fac = dist_fac_recip
        d = (pos - c2w[4:7]) * dist_fac
        d2 = float(d @ d)
        if d2 > distance_th:
            continue
        other_view = nps.quat_to_matrix(c2w[0:4])[:, 2]
        if float(other_view @ view) < cos_angle_th:
            continue
        ref_to_frame = nps.se3_from_sim3(
            nps.sim3_mul(nps.sim3_inverse(c2w), frame_c2w))
        out.append((kf, d2, nps.se3_inverse(ref_to_frame)))
    return out


@pytest.mark.parametrize("check_both_scales", [False, True])
def test_vectorized_matches_loop(check_both_scales):
    sys = _fake_system(64)
    graph = _make_graph(sys)
    query = sys.keyframes[17].pose.cam_to_world()
    got = graph.find_euclidean_overlap_frames(query, 1.1, 0.9, 0.75,
                                              check_both_scales)
    want = _loop_reference(graph, query, 1.1, 0.9, 0.75, check_both_scales)
    assert [kf.id for kf, _, _ in got] == [kf.id for kf, _, _ in want]
    for (_, d2a, pa), (_, d2b, pb) in zip(got, want):
        assert abs(d2a - d2b) < 1e-12
        np.testing.assert_allclose(pa, pb, atol=1e-12)


def test_pose_cache_invalidated_on_epoch():
    sys = _fake_system(16)
    graph = _make_graph(sys)
    # angle threshold that accepts every orientation (cos threshold = -1)
    angle_all = 2 * math.pi / (graph.fow_x + graph.fow_y)
    query = sys.keyframes[3].pose.cam_to_world().copy()
    before = graph.find_euclidean_overlap_frames(query, 1.0, 100.0, angle_all)
    # move a keyframe far away and invalidate the epoch (as merges do)
    sys.keyframes[5].pose.this_to_parent = np.concatenate(
        [[1, 0, 0, 0], [1000.0, 0, 0], [1.0]])
    sys.registry.invalidate_all()
    after = graph.find_euclidean_overlap_frames(query, 1.0, 100.0, angle_all)
    ids_before = {kf.id for kf, _, _ in before}
    ids_after = {kf.id for kf, _, _ in after}
    assert 5 in ids_before and 5 not in ids_after


def test_large_map_query_time_budget():
    """~1000-keyframe envelope (README.md:313-314): one query must stay
    well under a per-frame budget (the reference calls this several times
    per new keyframe)."""
    sys = _fake_system(1000)
    graph = _make_graph(sys)
    query = sys.keyframes[500].pose.cam_to_world()
    graph.find_euclidean_overlap_frames(query, 1.0, 2.0, 1.0)  # warm cache
    t0 = time.perf_counter()
    for _ in range(20):
        graph.find_euclidean_overlap_frames(query, 1.0, 2.0, 1.0)
    dt = (time.perf_counter() - t0) / 20
    assert dt < 0.01, f"{dt*1000:.2f} ms per query"
