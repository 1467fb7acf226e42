"""Interactive viewer server (pram_tpu/viz): the browser-facing replacement
for the reference's pangolin viewer (localization/viewer.py:409-560)."""

import json
import urllib.request

import numpy as np


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=10
    ) as r:
        return r.status, r.read()


def test_viewer_serves_map_and_state(rng):
    from pram_tpu.maps.synthetic import make_synthetic_scene
    from pram_tpu.viz import ViewerServer

    scene = make_synthetic_scene(
        rng, n_cluster=3, points_per_cluster=50, n_ref_frames=4, desc_dim=16
    )
    srv = ViewerServer(scene.map, port=0, max_points=100)
    try:
        # page
        code, body = _get(srv.port, "/")
        assert code == 200 and b"pram-tpu viewer" in body
        assert b"FollowCamera" in body and b"ShowSegs" in body

        # map payload
        code, body = _get(srv.port, "/map")
        m = json.loads(body)
        assert code == 200
        assert 0 < len(m["points"]) <= 100
        assert len(m["segs"]) == len(m["points"])
        assert len(m["frames"]) == 4  # frusta for every reference frame
        assert all(len(f) == 5 for f in m["frames"])  # apex + 4 corners
        assert len(m["vrfs"]) >= 1  # VRF slots (landmarks may share one)
        assert all(str(s) in m["seg_colors"] for s in set(m["segs"]))

        # state stream
        code, body = _get(srv.port, "/state")
        st = json.loads(body)
        assert st == {"seq": 0, "frames": []}

        R = np.eye(3, dtype=np.float32)
        srv.update(
            R=R, tvec=np.zeros(3, np.float32), success=True, tracking=False,
            matched_sid=1, num_inliers=77,
            times={"feat": 0.01, "rec": 0.002, "loc": 0.005, "total": 0.02},
            name="q0.png",
        )
        srv.update(R=R, tvec=np.ones(3, np.float32), success=False)
        code, body = _get(srv.port, "/state?since=0")
        st = json.loads(body)
        assert st["seq"] == 2 and len(st["frames"]) == 2
        f0 = st["frames"][0]
        assert f0["success"] and f0["matched_sid"] == 1
        assert f0["num_inliers"] == 77
        assert len(f0["frustum"]) == 5 and len(f0["center"]) == 3
        assert abs(f0["times"]["feat"] - 0.01) < 1e-9

        # delta polling: nothing new after seq 2
        code, body = _get(srv.port, "/state?since=2")
        assert json.loads(body)["frames"] == []
    finally:
        srv.close()
