"""`voldor()` — the pyvoldor-compatible VO entry point.

Same signature, shapes and return dict as the reference Cython binding
(slam_py/install/pyvoldor_full.pyx:14-70 -> voldor/py_export.cpp:5-79).
"""

from __future__ import annotations

import numpy as np

from voldor_tpu.config import VoldorConfig
from voldor_tpu.vo.engine import VoldorEngine


class VoWindow:
    """One dispatched VO window — the dispatch/collect split of voldor().

    voldor_dispatch() queues the whole window (engine init, fused EM solve,
    depth-confidence, optional on-device covisibility) WITHOUT waiting;
    collect() performs the single scalar readback and returns the decision
    data (poses, covars, covis scores). The dense maps (depth, conf) start
    an async device->host copy at dispatch time and materialize lazily via
    depth_host()/conf_host() — by then the copy has long overlapped the
    next window's device execution (slam/system.py pipelined driver)."""

    def __init__(self, engine, cfg, n_true, conf_dev, covis_dev,
                 spakf_covis_dev, host_copies=True):
        self.engine = engine
        self.cfg = cfg
        self.n_true = n_true
        self.depth_dev = engine.depth
        self.conf_dev = conf_dev
        self._covis_dev = covis_dev
        self._spakf_covis_dev = spakf_covis_dev
        self._res = None
        self._host_copies_started = False
        # host_copies=True enqueues the dense D2H transfers now: they fire
        # the moment the solve finishes, overlapping the covis dispatch and
        # the host epilogue. The pipelined mono driver passes False and
        # calls start_host_copies() only for keyframe windows — the ~0.9 MB
        # depth+conf transfer costs ~55 ms of remote-tunnel time per window
        # (docs/PLATFORM_NOTES.md rates), and the next window's scalar
        # readback queues behind it.
        if host_copies:
            self.start_host_copies()

    def start_host_copies(self):
        """Enqueue the dense depth/conf D2H copies (idempotent)."""
        if not self._host_copies_started:
            self._host_copies_started = True
            self.depth_dev.copy_to_host_async()
            self.conf_dev.copy_to_host_async()

    def collect(self) -> dict:
        """Block on the solve; ONE batched scalar readback. Returns the
        legacy voldor() dict minus the dense maps, plus 'covis' /
        'spakf_covis' when covisibility was requested at dispatch."""
        if self._res is not None:
            return self._res
        engine, n_true = self.engine, self.n_true
        fetch = [engine.poses6[:n_true], engine.pose_covars[:n_true]]
        names = ["poses", "poses_covar"]
        if self._covis_dev is not None:
            fetch.append(self._covis_dev)
            names.append("covis")
        if self._spakf_covis_dev is not None:
            fetch.append(self._spakf_covis_dev)
            names.append("spakf_covis")
        if self.cfg.save_everything:
            fetch.append(engine.rigidness[:n_true])
            names.append("rigidness")
        host = engine.finalize_host(fetch)
        n = min(engine.n_flows, n_true)
        res = {"n_registered": n}
        for name, val in zip(names, host):
            if name in ("poses", "poses_covar"):
                res[name] = np.array(val[:n], np.float32)
            else:
                res[name] = np.asarray(val, np.float32)
        self._res = res
        return res

    def depth_host(self) -> np.ndarray:
        return np.array(np.asarray(self.depth_dev), np.float32)

    def conf_host(self) -> np.ndarray:
        return np.array(np.asarray(self.conf_dev), np.float32)


def voldor_dispatch(
    flows: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    basefocal: float = 0.0,
    disparity: np.ndarray | None = None,
    disparity_pconf: np.ndarray | None = None,
    depth_priors=None,
    depth_prior_poses: np.ndarray | None = None,
    depth_prior_pconfs=None,
    config: str = "",
    pad_window_to: int | None = None,
    poses_init: np.ndarray | None = None,
    covis_spec: dict | None = None,
    host_copies: bool = True,
) -> VoWindow:
    """Queue one VO window asynchronously; see VoWindow.

    depth_priors / depth_prior_pconfs may be lists mixing host numpy maps
    and device jax.Array handles (previous window outputs). covis_spec
    requests on-device covisibility with the window's OUTPUT depth:
      {'conf_thresh': float,                       # depth-conf gate
       'spakf': (depth, conf, scale, M) | absent}  # keyframe gate inputs
    where M = Twc_cur_before_window @ Tcw_keyframe (ops/covis.py)."""
    import jax

    from voldor_tpu.ops.covis import covis_keyframe, covis_window
    from voldor_tpu.vo.engine import _depth_confidence_jit

    cfg = VoldorConfig(fx=float(fx), fy=float(fy), cx=float(cx), cy=float(cy),
                       basefocal=float(basefocal))
    cfg.read_config(config)

    if isinstance(flows, (list, tuple)):
        # per-transition entries mixing host numpy and device flow handles
        # (the SLAM driver's upload-ahead cache; engine._stack_flows)
        flows = list(flows)
        n_true = len(flows)
        if pad_window_to is not None and n_true < pad_window_to:
            shape = tuple(flows[0].shape)
            flows += [np.zeros(shape, np.float32)] * (pad_window_to - n_true)
    else:
        n_true = flows.shape[0]
        if pad_window_to is not None and n_true < pad_window_to:
            pad = np.zeros(
                (pad_window_to - n_true,) + flows.shape[1:], np.float32
            )
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

    conf_dev = _depth_confidence_jit(
        engine.rigidness, engine.dp_confs, engine._st_scalars[0]
    )
    covis_dev = spakf_covis_dev = None
    if covis_spec is not None:
        # numpy scalars/arrays only — eager device-scalar creation costs a
        # ~70 ms round trip on the remote platform (docs/PLATFORM_NOTES.md)
        K = np.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1]],
                     np.float32)
        thresh = np.float32(covis_spec["conf_thresh"])
        n_flows_dev = engine._st_scalars[0]
        covis_dev = covis_window(
            engine.depth, conf_dev, engine.poses6, n_flows_dev, K, thresh,
            n_cap=n_true,
        )
        spa = covis_spec.get("spakf")
        if spa is not None:
            sdep, sconf, sscale, M = spa
            if not isinstance(sdep, jax.Array):
                sdep = np.asarray(sdep, np.float32)
            if not isinstance(sconf, jax.Array):
                sconf = np.asarray(sconf, np.float32)
            spakf_covis_dev = covis_keyframe(
                sdep, sconf, np.float32(sscale),
                engine.poses6, n_flows_dev, np.asarray(M, np.float32),
                K, thresh, n_cap=n_true,
            )
    return VoWindow(engine, cfg, n_true, conf_dev, covis_dev, spakf_covis_dev,
                    host_copies=host_copies)


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
