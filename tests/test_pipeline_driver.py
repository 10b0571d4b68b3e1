"""Pipelined VO driver invariants (slam/system.py process_vo).

The cross-window pipeline (one window dispatched ahead, priors handed as
device handles) must be an INVISIBLE optimization: the map it produces has
to match the sequential driver's, and a map write-back (PGO) between calls
must flush the stale in-flight window instead of consuming it. The
reference has no analogous machinery (its VO calls are synchronous,
voldor_slam.py:447-457), so these invariants are ours to pin down.
"""

import json

import numpy as np
import jax.numpy as jnp

from voldor_tpu.ops import lie
from voldor_tpu.slam.system import VOLDOR_SLAM

from synthetic import render_window

H, W = 72, 96
FX = FY = 80.0
CX, CY = W / 2, H / 2


def _norm(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


PLANES = [
    (_norm([0.1, 0.15, 1.0]), 8.0),
    (_norm([-0.45, 0.1, 1.0]), 6.5),
    (_norm([0.3, -0.45, 1.0]), 7.0),
    (_norm([0.55, 0.35, 1.0]), 7.5),
    (_norm([-0.2, -0.5, 1.0]), 6.8),
]


def _make_sequence(n_flows=8):
    rng = np.random.default_rng(3)
    poses = np.zeros((n_flows, 6), np.float32)
    for f in range(n_flows):
        poses[f, :3] = rng.normal(0, 0.008, 3)
        poses[f, 3:6] = [0.35, 0.02, 0.18]
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)

    def r2R(rv):
        return np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rv, np.float32))))

    flows, depth0, Ts = render_window(K, poses, PLANES, H, W, r2R)
    return flows


def _make_slam(flows, pipeline: bool):
    slam = VOLDOR_SLAM(mode="mono")
    slam.use_image_info = False
    slam.voldor_user_config = "--n_poses_to_sample 2048 --depth_rand_samples 6"
    slam.vo_pipeline = pipeline
    slam.set_cam_params(FX, FY, CX, CY)
    slam.flows = [flows[i] for i in range(flows.shape[0])]
    slam.N_FRAMES = flows.shape[0] + 1
    slam.h, slam.w = H, W
    slam.flow_loader_pt = flows.shape[0]
    return slam


def test_pipeline_matches_sequential():
    """Same flows, same seeds: the pipelined driver must reproduce the
    sequential driver's map (same keyframes/edges; trajectories equal to
    float tolerance — the only mechanical difference is whether prior maps
    travel as device handles or host copies)."""
    flows = _make_sequence(8)

    runs = {}
    for pipeline in (False, True):
        slam = _make_slam(flows, pipeline)
        while slam.process_vo():
            pass
        runs[pipeline] = slam

    seq, pip = runs[False], runs[True]
    assert len(seq.frames) == len(pip.frames)
    assert seq.kf_ids == pip.kf_ids
    assert len(seq.edges) == len(pip.edges)
    ext = max(
        float(np.linalg.norm(seq.frames[-1].Tcw[:3, 3])), 1e-6
    )
    for fs, fp in zip(seq.frames, pip.frames):
        # rotation block and translation (relative to trajectory extent)
        assert np.allclose(fs.Tcw[:3, :3], fp.Tcw[:3, :3], atol=1e-4)
        assert np.linalg.norm(fs.Tcw[:3, 3] - fp.Tcw[:3, 3]) < 1e-3 * ext
    # keyframe depth maps match (device-handle vs host-copy bookkeeping)
    for kid in seq.kf_ids:
        da, db = seq.frames[kid].depth, pip.frames[kid].depth
        assert da is not None and db is not None
        assert np.allclose(da, db, rtol=1e-4, atol=1e-5)


def test_pipeline_flush_on_pgo_writeback(tmp_path):
    """A PGO write-back between process_vo calls bumps _map_version; the
    next call must DISCARD the in-flight window (its priors/warm start were
    dispatched against the pre-PGO map) and re-dispatch — visible as a
    vo_pipeline_flush metrics event — and still finish the sequence."""
    flows = _make_sequence(8)
    slam = _make_slam(flows, pipeline=True)
    mpath = tmp_path / "metrics.jsonl"
    slam.metrics.open(str(mpath))

    # first window: vo edges + a keyframe exist and (the sequence is longer
    # than one window) the NEXT window is in flight
    assert slam.process_vo()
    assert slam._vo_pending is not None

    slam.solve_pgo()  # write-back on the chain graph; bumps _map_version
    assert slam._vo_pending is not None  # still pending, now stale

    while slam.process_vo():
        pass
    slam.metrics.close()

    events = [json.loads(l) for l in mpath.read_text().splitlines()]
    assert any(e["event"] == "vo_pipeline_flush" for e in events)
    assert len(slam.frames) == int(slam.N_FRAMES)
    for f in slam.frames:
        assert np.all(np.isfinite(f.Tcw))
