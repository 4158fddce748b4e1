"""Live viewer: incremental stream consumption + poses-only graph updates.

Mirrors the reference viewer semantics: point buffers upload once per
keyframe (KeyFrameDisplay.cpp:106-222); graph messages re-pose cached
buffers without re-sending points (KeyFrameGraphDisplay.cpp:158-208).
"""

import json
import os

import numpy as np

from lsd_slam_tpu.lie import np_sim3 as nps
from lsd_slam_tpu.viewer.live import LiveViewer


def _write_kf(d, kf_id, tx=0.0):
    h, w = 24, 32
    rng = np.random.default_rng(kf_id)
    idepth = rng.uniform(0.4, 0.6, (h, w)).astype(np.float32)
    var = np.full((h, w), 1e-4, np.float32)
    color = rng.uniform(0, 255, (h, w)).astype(np.float32)
    c2w = np.array([1, 0, 0, 0, tx, 0, 0, 1.0], np.float64)
    path = os.path.join(d, f"kf_{kf_id:06d}.npz")
    np.savez_compressed(path, id=kf_id, time=float(kf_id),
                        cam_to_world=c2w, idepth=idepth, idepth_var=var,
                        color=color, mean_idepth=0.5, num_points=h * w,
                        fx=22.4, fy=22.4, cx=(w - 1) / 2, cy=(h - 1) / 2)
    return path


def test_viewer_consumes_incrementally(tmp_path):
    d = str(tmp_path)
    v = LiveViewer(d, out_png=os.path.join(d, "v.png"))
    assert v.poll() is False

    _write_kf(d, 0)
    assert v.poll() is True
    assert set(v.displays) == {0}
    img1 = v.render(np.array([1, 0, 0, 0, 0, 0, 3.0, 1.0]))
    assert img1.any(), "first keyframe must render points"

    _write_kf(d, 7, tx=0.5)
    with open(os.path.join(d, "poses.jsonl"), "w") as f:
        f.write(json.dumps({"id": 8, "time": 0.2,
                            "cam_to_world": [1, 0, 0, 0, 0.5, 0, 0, 1]})
                + "\n")
    assert v.poll() is True
    assert set(v.displays) == {0, 7}
    assert v.current_pose is not None and v.current_pose[4] == 0.5
    # nothing new -> no change
    assert v.poll() is False
    v.save()
    assert os.path.exists(v.out_png)


def test_graph_update_reposes_without_recompute(tmp_path):
    d = str(tmp_path)
    _write_kf(d, 0)
    _write_kf(d, 3)
    v = LiveViewer(d, out_png=os.path.join(d, "v.png"))
    v.poll()
    kd = v.displays[3]
    pts_buf = kd.local_points          # the once-uploaded buffer
    w0, _ = kd.world_points()

    new_c2w = np.asarray(nps.sim3_mul(
        nps.sim3_exp(np.array([0.3, 0, 0, 0, 0, 0, 0.0])),
        kd.cam_to_world))
    with open(os.path.join(d, "graph.jsonl"), "w") as f:
        f.write(json.dumps({
            "frames": [{"id": 3, "cam_to_world": list(map(float, new_c2w))}],
            "constraints": [{"from": 0, "to": 3, "err": 0.1}],
        }) + "\n")
    assert v.poll() is True
    assert v.displays[3].local_points is pts_buf, \
        "graph update must NOT touch the cached point buffer"
    w1, _ = v.displays[3].world_points()
    assert np.abs(w1 - w0).max() > 0.05, "pose update must move the points"
    assert len(v.constraints) == 1


def test_rewritten_keyframe_reloads(tmp_path):
    d = str(tmp_path)
    p = _write_kf(d, 0)
    v = LiveViewer(d, out_png=os.path.join(d, "v.png"))
    v.poll()
    old_buf = v.displays[0].local_points
    # re-finalized keyframe: file rewritten with newer mtime
    os.utime(p, (os.path.getmtime(p) + 5, os.path.getmtime(p) + 5))
    assert v.poll() is True
    assert v.displays[0].local_points is not old_buf
