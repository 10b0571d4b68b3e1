"""`voldor()` — the pyvoldor-compatible VO entry point.

Same signature, shapes and return dict as the reference Cython binding
(slam_py/install/pyvoldor_full.pyx:14-70 -> voldor/py_export.cpp:5-79).
"""

from __future__ import annotations

import numpy as np

from voldor_tpu.config import VoldorConfig
from voldor_tpu.vo.engine import VoldorEngine


def voldor(
    flows: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    basefocal: float = 0.0,
    disparity: np.ndarray | None = None,
    disparity_pconf: np.ndarray | None = None,
    depth_priors: np.ndarray | None = None,
    depth_prior_poses: np.ndarray | None = None,
    depth_prior_pconfs: np.ndarray | None = None,
    config: str = "",
    pad_window_to: int | None = None,
    poses_init: np.ndarray | None = None,
) -> dict:
    """Run one VO window.

    flows: (N, h, w, 2) float32; disparity: (h, w); depth_priors:
    (D, h, w) with (D, 6) poses; config: '--flag value' string in the
    reference dialect. pad_window_to: zero-pad short (tail) windows to a
    fixed frame count so they reuse the compiled executable (the padding
    frames are masked out by the engine's active count).

    Returns {'n_registered', 'poses' (n, 6), 'poses_covar' (n, 6, 6),
    'depth' (h, w), 'depth_conf' (h, w)}.
    """
    cfg = VoldorConfig(fx=float(fx), fy=float(fy), cx=float(cx), cy=float(cy),
                       basefocal=float(basefocal))
    cfg.read_config(config)

    n_true = flows.shape[0]
    if pad_window_to is not None and n_true < pad_window_to:
        pad = np.zeros((pad_window_to - n_true,) + flows.shape[1:], np.float32)
        flows = np.concatenate([np.asarray(flows, np.float32), pad])

    engine = VoldorEngine(cfg)
    engine.init(
        flows,
        disparity=disparity,
        disparity_pconf=disparity_pconf,
        depth_priors=depth_priors,
        depth_prior_poses=depth_prior_poses,
        depth_prior_pconfs=depth_prior_pconfs,
        poses_init=poses_init,
    )
    if pad_window_to is not None:
        engine.n_flows = min(engine.n_flows, n_true)
        engine.n_flows_init = n_true
    engine.solve(defer_host=True)

    # ONE batched device->host transfer for the solve scalars AND the
    # outputs: each device_get costs a full tunnel round trip (~30ms of
    # latency on the remote-TPU platform regardless of payload).
    from voldor_tpu.vo.engine import _depth_confidence_jit

    fetch = [
        engine.poses6[:n_true],
        engine.pose_covars[:n_true],
        engine.depth,
        _depth_confidence_jit(
            engine.rigidness, engine.dp_confs, engine._st_scalars[0]
        ),
    ]
    if cfg.save_everything:
        fetch.append(engine.rigidness[:n_true])
    host = engine.finalize_host(fetch)
    n = min(engine.n_flows, n_true)
    ret = {
        "n_registered": n,
        "poses": np.asarray(host[0][:n], np.float32),
        "poses_covar": np.asarray(host[1][:n], np.float32),
        "depth": np.asarray(host[2], np.float32),
        "depth_conf": np.asarray(host[3], np.float32),
    }
    if cfg.save_everything:
        # extra diagnostics (the reference dumps these to disk instead,
        # voldor.cpp:352-376): per-frame rigidness maps of the whole window.
        ret["rigidness"] = np.asarray(host[4], np.float32)
    return ret
