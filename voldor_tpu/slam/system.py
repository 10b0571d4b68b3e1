"""VOLDOR_SLAM: the full SLAM orchestrator.

Behavioral port of slam_py/voldor_slam.py:82-828 on top of the TPU-native
voldor()/falign()/pgo() engines: frame/edge graph, covisibility-gated VO
stepping, temporal/spatial keyframes, mono-scaled Huber depth-scale fit,
priority-matrix mapping scheduler with realtime links, loop closure, and
periodic + final pose-graph refinement.

Deviations from the reference (documented inline):
  * no Cython thread pool — the engines are JAX dispatches that already
    release the GIL while the device works;
  * loop-closure retrieval uses the vocabulary-free backends in
    loop_closure.py instead of pyDBoW3 (whose ORB vocabulary blob is not
    shipped upstream either);
  * GUI imshow debug views are disabled in headless environments.
"""

from __future__ import annotations

import os
import threading
import time

import numpy as np

from voldor_tpu.slam.frame import Edge, Frame
from voldor_tpu.slam.loop_closure import BowRetriever, ThumbnailRetriever  # noqa: F401 (both are public retriever backends)
from voldor_tpu.slam.rwlock import RWLock
from voldor_tpu.slam.slam_utils import (
    T6_to_T44,
    T44_to_T6,
    eval_covisibility,
    geometry_check,
    polish_T44,
)
from voldor_tpu.utils.flow_io import load_flow


class VOLDOR_SLAM:
    def __init__(self, mode: str = "mono"):
        self.voldor_winsize = 5

        # key-frame selection (voldor_slam.py:88-91)
        self.vostep_visibility_thresh = 0.8
        self.spakf_visibility_thresh = 0.8
        self.depth_covis_conf_thresh = 0.1

        # mono-scaled (voldor_slam.py:93-95)
        self.depth_scaling_max_pixels = 10000
        self.depth_scaling_conf_thresh = 0.3

        # voldor related, set before set_cam_params (voldor_slam.py:97-99)
        self.voldor_pose_sample_min_disp = 1.0
        self.voldor_pose_sample_max_disp = 200.0

        # pgo (voldor_slam.py:101-103)
        self.pgo_refine_kf_interval = 10
        self.pgo_local_kf_winsize = 50

        # frame alignment (voldor_slam.py:105-113)
        self.falign_vbf_factor = 5
        self.falign_crw = 10
        self.falign_local_link_stride = 4
        self.falign_local_depth_gblur_width = 3
        self.falign_local_image_gblur_width = 5
        self.falign_lc_link_stride = 3
        self.falign_lc_depth_gblur_width = 5
        self.falign_lc_image_gblur_width = 9
        # Coarse-to-fine LM schedule for the batched link solves (TPU knob,
        # no reference analog): the bulk of LM iterations run at
        # falign_coarse_stride (fewer residual pixels), then <= fine_iters
        # polish at the link stride. Shifting the slow lanes' iterations
        # onto the cheap grid cuts the dominant mapping cost ~2x at equal
        # gates/ATE. Stride 6 for BOTH link kinds (a stride-8 coarse for
        # local links handed off too far from the stride-4 optimum — the
        # fine phase saturated its budget on half the lanes); fine_iters
        # 12: measured pose deviation is identical at 12 vs 25
        # (docs/PERF_FALIGN.json local16_s4_c6_f12 / lc16_c2f_f12).
        # 0 disables c2f.
        self.falign_coarse_stride = 6
        self.falign_fine_iters = 12
        # Pre-compile the falign/PGO executables on a background thread
        # while the first VO windows run (see _aot_warmup_worker). The CUDA
        # reference pays its compiles at build time; this is the runtime
        # analog for a cold XLA process.
        self.aot_warmup = True
        # Local-link coalescing (see mapping_thread._process_pending):
        # dispatch pending local links once this many accumulate, or after
        # this many seconds, whichever first (PGO/end-of-run flush anyway).
        self.mp_link_batch_min = 12
        self.mp_link_max_delay_s = 3.0

        # loop closure (voldor_slam.py:115-119). Score threshold: the
        # reference's 0.04 is on DBoW3's L1 score scale; BowRetriever scores
        # are TF-IDF cosines on a different scale. 0.55 is the operating
        # point from docs/LC_PR.json (tools/lc_pr_curve.py): trained-vocab
        # P=1.0/R=1.0 — geometry_check gates the residual false positives
        # downstream either way.
        self.lc_bow_score_thresh = 0.55
        # Per-vocabulary threshold (r4 advisor): a PRETRAINED tree
        # vocabulary (real-scale, ~10^4+ words) sparsifies histograms and
        # uses the file's weights as idf, which shifts the whole cosine
        # score scale DOWN (docs/LC_PR.json bow_pretrained: median correct
        # 0.50/0.39 vs novel 0.29/0.21 on the two placesets) — at 0.55
        # recall collapses to 0.17/0.10. 0.35 is the measured compromise
        # operating point (F1 0.94 procedural / 0.71 real-photo);
        # geometry_check recovers the residual precision downstream.
        # enable_loop_closure applies this automatically when it loads a
        # vocabulary file.
        self.lc_bow_score_thresh_pretrained = 0.35
        self.lc_geo_inlier_thresh = 0.4
        # Cold-start schedule (VERDICT r3 #7): before the first k-majority
        # vocabulary fit the retriever scores on RANDOM prototypes, where
        # 0.55 only reaches P=0.57 (docs/LC_PR.json bow_random). Raising
        # the BoW bar instead (a 0.68 cold threshold, tried first) costs
        # recall 0.83 -> 0.43 and blinded LC entirely on short sequences
        # whose vocabulary never accumulates enough descriptors to train
        # (the 60-frame bench scene went from 13 LC edges to 0). Recall is
        # unrecoverable downstream; precision is not — so cold candidates
        # keep the 0.55 retrieval bar and must instead clear this STRICTER
        # geometry_check inlier rate (the discriminative signal that
        # actually separates true revisits from random-vocab noise; the
        # falign consistency/visibility gates then re-check every surviving
        # pair). Retrievers without a `trained` attribute
        # (ThumbnailRetriever) are treated as always-trained.
        self.lc_geo_inlier_cold_thresh = 0.5
        self.lc_min_kf_distance = 20
        self.lc_link_visibility_thresh = 0.65
        self.lc_link_consistency_thresh = 0.75

        # mapping (voldor_slam.py:121-128)
        self.mp_realtime_link_thresh = 0.95
        self.mp_no_link_thresh = 0.5
        self.mp_spatial_sigma = 10
        self.mp_temporal_sigma = 30
        self.mp_lc_sigma = 2
        self.mp_link_visibility_thresh = 0.75
        self.mp_link_consistency_thresh = 0.85

        # global flags (voldor_slam.py:130-137)
        self.mode = mode
        self.use_image_info = True
        self.end_of_vo = False
        self.voldor_user_config = ""
        self.disable_dp = False
        self.disable_local_mapping = False

        # internal
        from voldor_tpu.utils.metrics import MetricsLogger

        self.metrics = MetricsLogger()  # enable with .metrics.open(path)
        self.debug_dir = None  # set to dump per-window debug artifacts
        self.vo_pose_warmstart = True  # constant-velocity window pose init
        # cross-window VO pipelining (process_vo docstring): one window is
        # kept in flight across calls; _map_version invalidates it when a
        # PGO write-back rebases the map under the dispatched priors
        self.vo_pipeline = True
        self._vo_pending = None
        # flow upload-ahead: fid -> f16/f32 device handle, enqueued while
        # the in-flight solve occupies the device (_flow_upload_ahead)
        self._flow_dev_cache = {}
        self._flow_transfer_f16 = None  # resolved lazily from the config
        self._engine_resize = None  # resolved lazily from the config
        self._map_version = 0
        self._use_loop_closure = False
        self._block_vo_signal = False
        self._map_lock = RWLock()
        self._viewer_signal_map_changed = False
        self.show_debug = False

        if mode == "stereo":
            self.voldor_config = (
                "--silent --meanshift_kernel_var 0.1 --disp_delta 1 --delta 0.2 --max_iters 4 "
            )
            self.mp_realtime_link_thresh = 1
            self.pgo_refine_kf_interval = 20
        elif mode == "mono-scaled":
            self.voldor_config = (
                "--silent --meanshift_kernel_var 0.2 --delta 1.5 --max_iters 5 "
            )
            self.mp_realtime_link_thresh = 1
            self.pgo_refine_kf_interval = 20
        elif mode == "mono":
            self.voldor_config = (
                "--silent --meanshift_kernel_var 0.2 --delta 1.5 --max_iters 5 "
            )
            self.mp_realtime_link_thresh = 0.95
            self.pgo_refine_kf_interval = 10
        else:
            raise ValueError(f"Unknown SLAM mode - {mode}")

        self.flows: list[np.ndarray] = []
        self.images_grayf: list[np.ndarray] = []
        self.images_bgri: list[np.ndarray] = []
        self.disps: list[np.ndarray] = []
        self.flow_loader_pt = -1
        self.image_loader_pt = -1
        self.disp_loader_pt = -1
        self.lc_candidates: list[tuple[int, int]] = []

        self.fx = self.fy = self.cx = self.cy = 0.0
        self.basefocal = 0.0
        self.N_FRAMES = float("nan")
        self.w = self.h = 0

        self.fid_cur = 0
        self.fid_cur_tmpkf = -1
        self.fid_cur_spakf = -1
        self.Twc_cur = np.eye(4, dtype=np.float32)

        self.frames: list[Frame] = []
        self.edges: list[Edge] = []
        self.kf_ids: list[int] = []

    # ------------------------------------------------------------------
    def set_cam_params(self, fx, fy, cx, cy, basefocal="auto", rescale=1.0):
        """(voldor_slam.py:193-205) — auto virtual basefocal = 0.5*focal."""
        self.fx = fx * rescale
        self.fy = fy * rescale
        self.cx = cx * rescale
        self.cy = cy * rescale
        if basefocal == "auto" or basefocal <= 0:
            self.basefocal = (fx + fy) * 0.25 * rescale
        else:
            self.basefocal = basefocal * rescale
        self.K = np.array(
            [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]], np.float32
        )
        self.K_inv = np.linalg.inv(self.K)
        self.voldor_config += (
            f"--pose_sample_min_depth {self.basefocal / self.voldor_pose_sample_max_disp} "
            f"--pose_sample_max_depth {self.basefocal / self.voldor_pose_sample_min_disp} "
        )
        print(
            f"Camera parameters set to {self.fx}, {self.fy}, {self.cx}, "
            f"{self.cy}, {self.basefocal}"
        )

    # ------------------------------------------------------------------
    # loader sync + threads (voldor_slam.py:207-315)
    def _loader_sync(self, pt_attr, fid_query, no_block, block_when_uninit):
        if (getattr(self, pt_attr) == -1 and not block_when_uninit) or (
            fid_query >= self.N_FRAMES - 1
        ):
            return False
        while getattr(self, pt_attr) <= fid_query:
            if no_block:
                return False
            time.sleep(0.01)
        return True

    def flow_loader_sync(self, fid_query, no_block=False, block_when_uninit=False):
        return self._loader_sync("flow_loader_pt", fid_query, no_block, block_when_uninit)

    def image_loader_sync(self, fid_query, no_block=False, block_when_uninit=False):
        return self._loader_sync("image_loader_pt", fid_query, no_block, block_when_uninit)

    def disp_loader_sync(self, fid_query, no_block=False, block_when_uninit=False):
        return self._loader_sync("disp_loader_pt", fid_query, no_block, block_when_uninit)

    def flow_loader(self, flow_path, resize=1.0, n_cache=100, range=(0, 0)):
        """Feeds self.flows with bounded read-ahead. IO runs on the native
        C++ prefetcher (voldor_tpu/native/flow_loader.cpp) when available,
        falling back to the Python .flo reader."""
        from voldor_tpu.native.io import NativeFlowDir

        src = NativeFlowDir(flow_path, range=range)
        self.flow_loader_pt = 0
        print(f"{len(src)} flows loaded" + (" (native IO)" if src.native else ""))
        self.N_FRAMES = len(src) + 1
        self.h = int(src.h * resize)
        self.w = int(src.w * resize)

        # NB: the `range` parameter shadows the builtin (upstream API name)
        i = 0
        while i < len(src):
            while len(self.flows) - self.fid_cur > n_cache:
                time.sleep(0.01)
            flow = src.get(i)
            i += 1
            if flow.shape[0] != self.h or flow.shape[1] != self.w:
                flow = self._resize_flow(flow, self.w, self.h)
            self.flows.append(flow)
            self.flow_loader_pt += 1
        src.close()

    @staticmethod
    def _resize_flow(flow, w, h):
        import cv2

        sx, sy = w / flow.shape[1], h / flow.shape[0]
        flow = cv2.resize(flow, (w, h))
        flow[..., 0] *= sx
        flow[..., 1] *= sy
        return flow

    def image_loader(self, image_path, n_cache=100, range=(0, 0)):
        import cv2

        if self.h == 0 or self.w == 0:
            raise RuntimeError("Need start optical flow loader first.")
        self.image_loader_pt = 0
        image_fn_list = sorted(os.listdir(image_path))
        if range != (0, 0):
            image_fn_list = image_fn_list[range[0] : range[1]]
        print(f"{len(image_fn_list)} images loaded")
        for fn in image_fn_list:
            while len(self.images_grayf) - self.fid_cur > n_cache or self.flow_loader_pt <= 0:
                time.sleep(0.01)
            img = cv2.imread(os.path.join(image_path, fn), cv2.IMREAD_COLOR)
            if img.shape[0] != self.h or img.shape[1] != self.w:
                img = cv2.resize(img, (self.w, self.h))
            self.images_bgri.append(img.copy())
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float32) / 255.0
            self.images_grayf.append(img)
            self.image_loader_pt += 1

    def disp_loader(self, disp_path, n_cache=100, range=(0, 0)):
        if self.h == 0 or self.w == 0:
            raise RuntimeError("Need start optical flow loader first.")
        self.disp_loader_pt = 0
        disp_fn_list = sorted(os.listdir(disp_path))
        if range != (0, 0):
            disp_fn_list = disp_fn_list[range[0] : range[1]]
        print(f"{len(disp_fn_list)} disparities loaded")

        # .flo-format disparity (KITTI stereo: negated x-flow,
        # voldor_slam.py:302-309) is a second full flow directory — run it
        # through the same native C++ prefetcher as the flows
        src = None
        if disp_fn_list and all(f.endswith(".flo") for f in disp_fn_list):
            from voldor_tpu.native.io import NativeFlowDir

            src = NativeFlowDir(disp_path, range=range)

        for i, fn in enumerate(disp_fn_list):
            while len(self.disps) - self.fid_cur > n_cache or self.flow_loader_pt <= 0:
                time.sleep(0.01)
            if src is not None:
                disp = np.ascontiguousarray(-src.get(i)[..., 0])
            elif fn.endswith(".flo"):
                disp = -load_flow(os.path.join(disp_path, fn))[..., 0]
                disp = np.ascontiguousarray(disp)
            elif fn.endswith(".png"):
                import cv2

                disp = cv2.imread(os.path.join(disp_path, fn), cv2.IMREAD_UNCHANGED)
                disp = disp.astype(np.float32) / 256.0
            else:
                raise ValueError(f"Unsupported disparity format {fn}")
            if disp.shape[0] != self.h or disp.shape[1] != self.w:
                import cv2

                disp = cv2.resize(disp, (self.w, self.h)) * (self.w / disp.shape[1])
            self.disps.append(disp)
            self.disp_loader_pt += 1
        if src is not None:
            src.close()

    # ------------------------------------------------------------------
    def save_poses(self, file_path="./output_pose.txt", format="KITTI"):
        """(voldor_slam.py:317-329)"""
        with open(file_path, "w") as f:
            for fid in range(int(self.N_FRAMES)):
                T = self.frames[fid].Tcw
                if format == "KITTI":
                    f.write(" ".join(str(v) for v in T[:3, :4].reshape(-1)))
                    f.write("\n")
                elif format == "TartanAir":
                    from voldor_tpu.slam.slam_utils import R_to_rvec  # noqa: F401
                    import numpy.linalg as _la

                    R = T[:3, :3]
                    # quaternion xyzw from R
                    q = _quat_xyzw_from_R(R)
                    t = T[:3, 3]
                    f.write(f"{t[2]} {t[0]} {t[1]} {q[2]} {q[0]} {q[1]} {q[3]}\n")
        print(f"Camera poses saved to {file_path} with {format} format")

    def save_depth_maps(self, save_dir="./depths", zfill=6):
        """(voldor_slam.py:331-337)"""
        os.makedirs(save_dir, exist_ok=True)
        for fid in self.kf_ids:
            np.save(
                os.path.join(save_dir, f"{str(fid).zfill(zfill)}_depth.npy"),
                self.frames[fid].get_scaled_depth(),
            )
            np.save(
                os.path.join(save_dir, f"{str(fid).zfill(zfill)}_depth_conf.npy"),
                self.frames[fid].depth_conf,
            )
        print(f"{len(self.kf_ids)} depth maps saved to {save_dir}")

    # ------------------------------------------------------------------
    def enable_loop_closure(self, voc_path=None, retriever=None):
        """Loop closure (loop_closure.py). voc_path, when it points at a
        DBoW2/3 vocabulary — text (ORBvoc.txt[.gz]) or binary
        (ORBvoc.bin), the reference's enable_loop_closure artifacts
        (voldor_slam.py:340-359) — is loaded into a TreeVocabulary-backed
        retriever; otherwise the built-in online-learned vocabulary takes
        over."""
        try:
            import cv2

            self.feature_detector = cv2.ORB_create()
        except ImportError:
            print("Error: Loop closure not available. Needs cv2 for ORB features.")
            return
        if voc_path and retriever is None:
            from voldor_tpu.slam.loop_closure import load_vocabulary

            try:
                voc = load_vocabulary(voc_path)
                retriever = BowRetriever(vocabulary=voc)
                # pretrained vocabularies score on a lower cosine scale
                # (see lc_bow_score_thresh_pretrained rationale in __init__)
                self.lc_bow_score_thresh = self.lc_bow_score_thresh_pretrained
                print(f"Loaded vocabulary from {voc_path} "
                      f"({voc.n_words} words, k={voc.k} L={voc.L}, "
                      f"score thresh -> {self.lc_bow_score_thresh})")
            except (OSError, ValueError) as e:
                print(
                    f"Note: could not load vocabulary '{voc_path}' ({e}) — "
                    "using the built-in online-learned vocabulary."
                )
        # BowRetriever (TF-IDF over the ORB descriptors append_kf already
        # computes) measured 0.92 precision@1 vs the thumbnail backend's
        # 0.75 on the synthetic revisit harness (test_loop_closure.py).
        # NOT `retriever or ...`: retrievers define __len__, so a freshly
        # constructed (empty) one is falsy and would be silently replaced
        self.retriever = retriever if retriever is not None else BowRetriever()
        self._use_loop_closure = True

    # ------------------------------------------------------------------
    def solve_pgo(self, fid_start=0):
        """(voldor_slam.py:361-414)

        Unlike the reference (which holds the map write lock across the
        whole Ceres solve), the graph is SNAPSHOT under a read lock, the
        solve runs with no lock held (a big/first-bucket solve otherwise
        stalls the VO thread for seconds — docs/PERF_SLAM_PHASES.json),
        and the result is applied under a short write lock. Frames the VO
        thread appended during the solve chain off the last snapshot frame
        by pure VO edges, so they (and Twc_cur) are rebased by that
        frame's world-frame correction — the same exact-chain-composition
        argument as pgo/reduce.py. _map_version still invalidates
        in-flight VO priors built from the old map.

        The snapshot itself takes the WRITE lock: the VO thread appends
        frames under the read lock (it is the only appender), so only the
        write lock excludes it — but the hold is now a memcpy, not a
        solve."""
        from voldor_tpu.pgo.api import pgo as py_pgo

        with self._map_lock.w_locked():
            n_frames_total = len(self.frames) + 1  # +1 for Twc_cur
            n_edges_total = len(self.edges)
            n_frames = n_frames_total - fid_start
            if n_frames <= 0:
                return
            poses_idx = np.zeros(n_frames, np.int32)
            poses = np.zeros((n_frames, 7), np.float32)
            edges_idx = np.zeros((n_edges_total, 2), np.int32)
            edges_pose = np.zeros((n_edges_total, 7), np.float32)
            edges_covar = np.zeros((n_edges_total, 7, 7), np.float32)

            for i in range(fid_start, n_frames_total - 1):
                poses_idx[i - fid_start] = i
                poses[i - fid_start, :6] = T44_to_T6(self.frames[i].Tcw)
                poses[i - fid_start, 6] = np.log(self.frames[i].scale)
            poses_idx[n_frames - 1] = n_frames_total - 1
            poses[n_frames - 1, :6] = T44_to_T6(np.linalg.inv(self.Twc_cur))
            poses[n_frames - 1, 6] = np.log(self.frames[n_frames_total - 2].scale)

            n_edges = 0
            for e in self.edges:
                if fid_start <= e.fid1 < n_frames_total and fid_start <= e.fid2 < n_frames_total:
                    edges_idx[n_edges] = [e.fid1, e.fid2]
                    edges_pose[n_edges] = e.pose
                    edges_covar[n_edges] = e.pose_covar
                    n_edges += 1
            if n_edges == 0:
                return

        t_solve = time.perf_counter()
        poses_ret = py_pgo(
            poses=poses,
            poses_idx=poses_idx,
            edges_idx=edges_idx[:n_edges],
            edges_pose=edges_pose[:n_edges],
            edges_covar=edges_covar[:n_edges],
            optimize_7dof=self.mode == "mono",
        )
        t_solve = time.perf_counter() - t_solve

        with self._map_lock.w_locked():
            last = n_frames_total - 2  # last REAL frame in the snapshot
            # world-frame correction of the last snapshot frame, computed
            # against its CURRENT pose (process_vo may have refined it):
            # appended frames are relative to the current map
            Tcw_last_new = T6_to_T44(poses_ret[n_frames - 2, :6]).astype(np.float32)
            D = Tcw_last_new @ np.linalg.inv(self.frames[last].Tcw)
            ds = float(np.exp(poses_ret[n_frames - 2, 6])) / self.frames[last].scale

            for i in range(n_frames - 1):
                self.frames[i + fid_start].Tcw = T6_to_T44(poses_ret[i, :6]).astype(np.float32)
                self.frames[i + fid_start].scale = float(np.exp(poses_ret[i, 6]))
            for i in range(n_frames_total - 1, len(self.frames)):
                self.frames[i].Tcw = (D @ self.frames[i].Tcw).astype(np.float32)
                self.frames[i].scale = float(self.frames[i].scale * ds)
            # rebase the live camera by the same correction (relative pose
            # to the last frame preserved exactly)
            self.Twc_cur = np.linalg.inv(
                D @ np.linalg.inv(self.Twc_cur)
            ).astype(np.float32)
            # the rebased map invalidates any in-flight VO window whose
            # priors were built from the old poses/scales
            self._map_version += 1
            print(
                f"solve pgo {fid_start}-{n_frames_total}, n_frames={n_frames}, n_edges={n_edges}"
            )
            self.metrics.log(
                "pgo", fid_start=int(fid_start), n_frames=int(n_frames),
                n_edges=int(n_edges), solve_s=round(t_solve, 4),
            )

    # ------------------------------------------------------------------
    def _vo_window_inputs(self):
        """Assemble the dispatch inputs for the window starting at fid_cur
        (the prior/warm-start prep of voldor_slam.py:416-447). Prior maps
        prefer the frames' DEVICE handles (pipelined path — no host round
        trip); covisibility inputs ride the same dispatch (ops/covis.py)."""
        from voldor_tpu.vo.engine import DeviceMap

        depth_priors, depth_prior_pconfs, depth_prior_poses = [], [], []
        dpkf_list = []
        if not self.disable_dp:
            if self.fid_cur_tmpkf >= 0:
                dpkf_list.append(self.fid_cur_tmpkf)
            if self.fid_cur_spakf >= 0 and self.fid_cur_spakf != self.fid_cur_tmpkf:
                dpkf_list.append(self.fid_cur_spakf)
        for fid in dpkf_list:
            f = self.frames[fid]
            if f.depth_dev is not None:
                depth_priors.append(DeviceMap(f.depth_dev, f.scale))
                depth_prior_pconfs.append(f.conf_dev)
            else:
                depth_priors.append(f.get_scaled_depth())
                depth_prior_pconfs.append(f.depth_conf)
            depth_prior_poses.append(
                T44_to_T6(np.linalg.inv(self.Twc_cur @ f.Tcw))
            )

        if not self.flow_loader_sync(
            min(self.fid_cur + self.voldor_winsize - 1, int(self.N_FRAMES) - 2)
        ):
            raise RuntimeError("Flow loader not working or files are missing.")
        if self.mode == "stereo" and not self.disp_loader_sync(self.fid_cur):
            raise RuntimeError("Disparity loader not working or files are missing.")

        # Constant-velocity pose warm start (TPU deviation, A/B'd in
        # docs/ACCURACY_AB.json): every window transition initializes
        # at the last solved transition's relative pose, which gives
        # the batched (Jacobi) camera sweep plausible chain transforms
        # on its first EM iteration. The reference always starts from
        # zero (voldor.cpp:130).
        poses_init = None
        if self.vo_pose_warmstart and self.fid_cur >= 1 and depth_priors:
            # frames[] holds 0..fid_cur-1; the current frame's
            # world->cam is Twc_cur (frames[fid] appends after solve)
            rel = self.Twc_cur @ self.frames[self.fid_cur - 1].Tcw
            poses_init = np.tile(
                np.asarray(T44_to_T6(rel), np.float32),
                (self.voldor_winsize, 1),
            )

        # on-device covisibility (ops/covis.py): the vo_step gate over the
        # window's own output depth and, when a distinct spatial KF exists,
        # the spakf retention gate for every candidate step — both ride the
        # solve's scalar readback so no dense map blocks window stepping
        covis_spec = {"conf_thresh": self.depth_covis_conf_thresh}
        if self.fid_cur_spakf >= 0:
            fs = self.frames[self.fid_cur_spakf]
            if fs.depth_dev is not None:
                sdep, sconf = fs.depth_dev, fs.conf_dev
            else:
                sdep, sconf = fs.depth, fs.depth_conf
            covis_spec["spakf"] = (sdep, sconf, fs.scale, self.Twc_cur @ fs.Tcw)

        return dict(
            # per-transition list: entries come from the upload-ahead cache
            # (f16 device handles transferred while the PREVIOUS solve
            # occupied the device) when present, host numpy otherwise —
            # engine._stack_flows unifies them with identical numerics.
            # ~90 ms of tunnel H2D per window otherwise sits between two
            # device programs (docs/PERF_WINDOW.json stage decomposition).
            flows=self._window_flows(),
            disparity=self.disps[self.fid_cur] if self.mode == "stereo" else None,
            depth_priors=depth_priors or None,
            depth_prior_pconfs=depth_prior_pconfs or None,
            depth_prior_poses=(
                np.stack(depth_prior_poses) if depth_prior_poses else None
            ),
            poses_init=poses_init,
            covis_spec=covis_spec,
            fid=int(self.fid_cur),
        )

    def _engine_resize_factor(self) -> float:
        """resize_factor of the parsed engine config (user configs may carry
        --resize_factor; the SLAM loaders usually resize at load time so
        this is normally 1.0). Parsed once, cached."""
        if self._engine_resize is None:
            from voldor_tpu.config import VoldorConfig

            cfg = VoldorConfig(fx=1.0, fy=1.0, cx=0.0, cy=0.0)
            cfg.read_config(self.voldor_config + " " + self.voldor_user_config)
            self._engine_resize = float(cfg.resize_factor)
        return self._engine_resize

    def _window_flows(self):
        """Flows entry for the window dispatch. Default: a per-transition
        list mixing upload-ahead device handles and host numpy (see
        _vo_window_inputs). With an engine-side --resize_factor != 1 the
        engine's list path cannot resize (device handles are already
        uploaded at full size), so fall back to a plain host stack — the
        engine's array path resizes it exactly as the reference does."""
        lo = self.fid_cur
        hi = min(self.fid_cur + self.voldor_winsize, len(self.flows))
        if self._engine_resize_factor() != 1.0:
            return np.stack(
                [np.asarray(self.flows[f], np.float32) for f in range(lo, hi)]
            )
        return [self._flow_dev_cache.get(f, self.flows[f]) for f in range(lo, hi)]

    def _flow_upload_ahead(self):
        """Enqueue async H2D transfers for the flows the NEXT window may
        need, right after a window was dispatched — the transfers ride the
        tunnel while the in-flight solve occupies the compute core, taking
        ~90 ms/window of upload off the device-idle critical path
        (docs/PERF_WINDOW.json). Speculative by at most winsize-1 extra
        maps at sequence end (~0.2 MB each); entries behind fid_cur are
        dropped. Transfers round through the config transfer dtype so the
        solve sees bit-identical flows either way (engine._stack_flows)."""
        import jax.numpy as jnp

        if self._engine_resize_factor() != 1.0:
            return  # host-stack path (see _window_flows); nothing to upload
        if self._flow_transfer_f16 is None:
            from voldor_tpu.config import VoldorConfig

            cfg = VoldorConfig(fx=1.0, fy=1.0, cx=0.0, cy=0.0)
            cfg.read_config(
                self.voldor_config + " " + self.voldor_user_config
            )
            self._flow_transfer_f16 = cfg.transfer_dtype == "float16"
        for f in list(self._flow_dev_cache):
            if f < self.fid_cur:
                del self._flow_dev_cache[f]
        # len(self.flows) (the loader's append-only feed) already bounds
        # the sequence; no N_FRAMES term (it is NaN before the loader runs)
        hi = min(self.fid_cur + 2 * self.voldor_winsize, len(self.flows))
        for f in range(self.fid_cur + 1, hi):
            if f not in self._flow_dev_cache:
                flow = np.asarray(self.flows[f], np.float32)
                if self._flow_transfer_f16:
                    flow = flow.astype(np.float16)
                self._flow_dev_cache[f] = jnp.asarray(flow)

    def _vo_dispatch(self, inputs):
        from voldor_tpu.vo.api import voldor_dispatch

        return voldor_dispatch(
            flows=inputs["flows"],
            fx=self.fx, fy=self.fy, cx=self.cx, cy=self.cy,
            basefocal=self.basefocal,
            disparity=inputs["disparity"],
            depth_priors=inputs["depth_priors"],
            depth_prior_pconfs=inputs["depth_prior_pconfs"],
            depth_prior_poses=inputs["depth_prior_poses"],
            config=self.voldor_config + " " + self.voldor_user_config
            + (" --save_everything" if self.debug_dir else ""),
            pad_window_to=self.voldor_winsize,
            poses_init=inputs["poses_init"],
            covis_spec=inputs["covis_spec"],
            # dense host copies are deferred to keyframe windows
            # (process_vo calls start_host_copies at the kf decision):
            # ~0.9 MB/window of remote-tunnel traffic that non-keyframe
            # windows never consume. mono-scaled fits on the host every
            # window; debug dumps need every map.
            host_copies=(self.mode == "mono-scaled") or bool(self.debug_dir),
        )

    def process_vo(self):
        """(voldor_slam.py:416-536) — pipelined across calls: the NEXT
        window's solve is dispatched at the END of each call, so its
        ~200 ms of device time overlaps this thread's inter-window host
        work (frame/edge bookkeeping, dense-map materialization, flow IO).
        Window stepping decisions come from the on-device covisibility
        scores delivered in the same single scalar readback as the poses —
        no dense map ever sits on the dispatch critical path. A map
        write-back (PGO) between calls bumps _map_version and invalidates
        the in-flight window: it is discarded and re-dispatched against
        the rebased map."""
        import time as _time

        _t0 = _time.perf_counter()
        win_log = None
        kf_append = None
        with self._map_lock.r_locked():
            if self.fid_cur >= (self.N_FRAMES - 1):
                self._vo_pending = None
                self.frames.append(Frame(np.linalg.inv(self.Twc_cur)))
                self.fid_cur = int(self.N_FRAMES)
                return False

            prev_prior_fids = {self.fid_cur_tmpkf, self.fid_cur_spakf}
            pend = self._vo_pending
            self._vo_pending = None
            if (
                pend is not None
                and pend["fid"] == self.fid_cur
                and pend["map_version"] == self._map_version
            ):
                handle, inputs = pend["handle"], pend["inputs"]
            else:
                if pend is not None:
                    self.metrics.log("vo_pipeline_flush", fid=int(self.fid_cur))
                inputs = self._vo_window_inputs()
                handle = self._vo_dispatch(inputs)
                self._flow_upload_ahead()  # overlaps this window's solve
            vo_ret = handle.collect()

            if self.debug_dir:
                from voldor_tpu.utils.debug_viz import dump_window_debug

                dbg = dict(vo_ret)
                dbg["depth"] = handle.depth_host()
                dbg["depth_conf"] = handle.conf_host()
                dump_window_debug(self.debug_dir, int(self.fid_cur), dbg)

            if vo_ret["n_registered"] == 0:
                print(f"Tracking lost at {self.fid_cur}")
                self.metrics.log("tracking_lost", fid=int(self.fid_cur))
                self.frames.append(Frame(np.linalg.inv(self.Twc_cur)))
                self.edges.append(
                    Edge(self.fid_cur, self.fid_cur + 1, pose=Edge.pose_static,
                         pose_covar=Edge.pose_covar_null, edge_type="none")
                )
                self.fid_cur_tmpkf = -1
                self.fid_cur_spakf = -1
                self.fid_cur += 1
            else:
                if self.mode == "mono-scaled":
                    if not self.disp_loader_sync(self.fid_cur):
                        raise RuntimeError("Disparity loader not working or files are missing.")
                    # materialize the window maps: the Huber disparity fit
                    # rescales them in place (this window then stays on the
                    # host path; the covis gates are scale-invariant since
                    # the fit rescales depth and translations jointly)
                    vo_ret["depth"] = handle.depth_host()
                    vo_ret["depth_conf"] = handle.conf_host()
                    self._mono_scaled_fit(vo_ret)

                Tc1c2 = T6_to_T44(vo_ret["poses"])

                # window stepping from the on-device covisibility scores
                # (the reference's host eval_covisibility loop,
                # voldor_slam.py:449-458; ops/covis.py parity-tested)
                vo_step = 0
                for i in range(vo_ret["n_registered"]):
                    vo_step += 1
                    if vo_ret["covis"][i] < self.vostep_visibility_thresh:
                        break

                for i in range(vo_step):
                    if i == 0:
                        f0 = Frame(np.linalg.inv(self.Twc_cur))
                        if "depth" in vo_ret:  # mono-scaled host maps
                            f0.depth = vo_ret["depth"]
                            f0.depth_conf = vo_ret["depth_conf"]
                        else:
                            f0.set_window_maps(handle.depth_dev, handle.conf_dev)
                        self.frames.append(f0)
                    else:
                        self.frames.append(Frame(np.linalg.inv(self.Twc_cur)))
                    tmpkf_scale = (
                        self.frames[self.fid_cur_tmpkf].scale
                        if self.fid_cur_tmpkf >= 0
                        else 1.0
                    )
                    self.edges.append(
                        Edge(self.fid_cur + i, self.fid_cur + i + 1,
                             pose=vo_ret["poses"][i], pose_covar=vo_ret["poses_covar"][i],
                             pose_eval_time_scale=tmpkf_scale, edge_type="vo")
                    )
                    self.Twc_cur = (Tc1c2[i] @ self.Twc_cur).astype(np.float32)
                    polish_T44(self.Twc_cur)

                if self.fid_cur_spakf >= 0:
                    # spakf retention gate at the step actually taken
                    if (
                        vo_ret["spakf_covis"][vo_step - 1]
                        < self.spakf_visibility_thresh
                    ):
                        kf_append = self.fid_cur
                        self.fid_cur_spakf = self.fid_cur
                else:
                    kf_append = self.fid_cur
                    self.fid_cur_spakf = self.fid_cur
                if kf_append is not None:
                    # this window's frame 0 becomes a keyframe: start the
                    # deferred dense D2H copies now (they overlap the next
                    # window's device time; mapping reads the host maps)
                    handle.start_host_copies()

                # deferred to after the next window's dispatch: the dense
                # conf stat would otherwise complete its device->host copy
                # (and burn host time even with metrics disabled) while the
                # device sits idle waiting for the dispatch
                if self.metrics.enabled:
                    win_log = dict(
                        fid=int(self.fid_cur),
                        n_registered=int(vo_ret["n_registered"]),
                        vo_step=int(vo_step),
                        n_priors=(
                            len(inputs["depth_priors"])
                            if inputs["depth_priors"] is not None else 0
                        ),
                        _frame=self.frames[self.fid_cur],
                    )
                self.fid_cur_tmpkf = self.fid_cur
                self.fid_cur += vo_step

            # ---- pipeline: dispatch the NEXT window before returning, so
            # its device time overlaps the caller's inter-window host work.
            # The pending record is validated against fid/map_version at
            # the next call (PGO write-backs invalidate it).
            if self.vo_pipeline and self.fid_cur < (self.N_FRAMES - 1):
                nxt = self._vo_window_inputs()
                self._vo_pending = dict(
                    fid=int(self.fid_cur),
                    map_version=self._map_version,
                    handle=self._vo_dispatch(nxt),
                    inputs=nxt,
                )
                # flows for the window after the one just dispatched:
                # transfers overlap the in-flight solve
                self._flow_upload_ahead()

            # frames that stopped being prior keyframes drop their device
            # handles (host copies were enqueued at their solve; this
            # bounds device memory to the two active prior frames). Runs
            # AFTER the next dispatch — off the device-idle critical path.
            for pid in prev_prior_fids - {self.fid_cur_tmpkf, self.fid_cur_spakf}:
                if pid >= 0:
                    self.frames[pid].release_device()

            # keyframe feature work (image IO wait, ORB, BoW query,
            # loop-closure geometry checks) overlaps the in-flight solve —
            # only the spakf id itself was needed before the dispatch
            if kf_append is not None:
                self.append_kf(kf_append)

            if win_log is not None:
                f0 = win_log.pop("_frame")
                # only when host maps exist or were enqueued (keyframe /
                # mono-scaled windows): forcing a dense D2H here would
                # reintroduce the per-window tunnel transfer the deferred-
                # copy scheme removes. -1 marks 'not materialized'.
                conf_avail = (f0._depth_conf is not None
                              or (f0.is_keyframe and f0.conf_dev is not None))
                self.metrics.log(
                    "vo_window",
                    window_s=round(_time.perf_counter() - _t0, 4),
                    mean_depth_conf=(
                        float(np.mean(f0.depth_conf)) if conf_avail else -1.0
                    ),
                    **win_log,
                )
        return True

    def _mono_scaled_fit(self, vo_ret):
        """Huber regression of predicted vs observed disparity
        (voldor_slam.py:472-492)."""
        from sklearn.linear_model import HuberRegressor

        # Deviation from voldor_slam.py:474-476: ALSO mask invalid
        # disparity (<= 0 = "no measurement" — SGBM holes, Kinect shadow).
        # The reference regresses against the raw map; real stereo
        # disparity with 20-40% holes drags the Huber fit past its
        # breakdown point (measured on docs/REAL_DATA.json's SGBM input:
        # scale biased 1.4x until holes are masked).
        mask = (vo_ret["depth_conf"] > self.depth_scaling_conf_thresh) & (
            self.disps[self.fid_cur] > 1e-6
        )
        src = self.basefocal / vo_ret["depth"][mask]
        dst = self.disps[self.fid_cur][mask]
        if src.size > self.depth_scaling_max_pixels:
            idx = np.random.permutation(src.size)[: self.depth_scaling_max_pixels]
            src, dst = src[idx], dst[idx]
        if src.size < 10:
            return
        huber = HuberRegressor(fit_intercept=False).fit(src.reshape(-1, 1), dst)
        scale = float(np.clip(1.0 / huber.coef_[0], 0.1, 10))
        vo_ret["depth"] *= scale
        vo_ret["poses"][:, 3:6] *= scale
        vo_ret["poses_covar"][:, :, 3:6] *= scale
        vo_ret["poses_covar"][:, 3:6, :] *= scale

    # ------------------------------------------------------------------
    def _gblur(self, img, k):
        try:
            import cv2

            return cv2.GaussianBlur(img, (k, k), 0)
        except ImportError:
            import jax.numpy as jnp

            from voldor_tpu.ops.image import gaussian_blur

            return np.asarray(gaussian_blur(jnp.asarray(img), k))

    def establish_local_links(self, kf_ids):
        """(voldor_slam.py:538-594)"""
        self.establish_links_batch([tuple(kf_ids)], kind="local")

    def establish_links_batch(self, pair_list, kind="local"):
        """Solve MANY independent 2-keyframe link problems in ONE falign
        dispatch (SURVEY 2.8 task-parallel; the reference issues them one
        at a time through a host thread pool, voldor_slam.py:790-800).

        Frames are duplicated per pair and wired with block-diagonal
        connectivity [(2i, 2i+1), (2i+1, 2i)], so each pair solves exactly
        as the reference's independent problems (the per-component scale
        gauge in falign keeps pairs decoupled) while the device runs all
        of them as one LM program. The frame count pads to a power-of-two
        bucket so the number of compiled executables stays logarithmic.

        kind: 'local' (single photo+geo stage, pose init from the current
        map) or 'lc' (two-stage geometry->photometric, identity init,
        mono median-10 depth normalization — voldor_slam.py:597-675).
        Per-pair gates, metrics, and edges match the unbatched paths."""
        from voldor_tpu.falign.api import falign_pairs

        if not pair_list:
            return
        # Two-bucket chunking {4, 16}: each falign executable is compiled
        # per (lane bucket, stride, photo) and a compile costs 60-90 s on
        # this platform — with the mapping scheduler's timing-dependent
        # batching, a rich bucket lattice ({1,2,4,8,16} was tried) makes
        # the set of compiled executables nondeterministic across runs and
        # a 'warm' pass can hit an uncompiled bucket mid-run. Two buckets
        # keep the worst lane padding bounded (a 1-pair dispatch pays 4
        # lanes; the batched LM's cost is near-linear in lanes,
        # docs/PERF_FALIGN.json) while a 9..16-pair dispatch still avoids
        # the old 2x pad-to-16 waste via a 16 + remainder split only when
        # the remainder itself fills a bucket.
        P = len(pair_list)
        if P > 16:
            for i in range(0, P, 16):
                self.establish_links_batch(pair_list[i : i + 16], kind=kind)
            return
        if 5 <= P <= 8:
            # two 4-buckets beat one padded 16 (8 vs 16 lane-iterations)
            self.establish_links_batch(pair_list[:4], kind=kind)
            self.establish_links_batch(pair_list[4:], kind=kind)
            return
        is_lc = kind == "lc"
        stride = self.falign_lc_link_stride if is_lc else self.falign_local_link_stride
        d_blur = (self.falign_lc_depth_gblur_width if is_lc
                  else self.falign_local_depth_gblur_width)
        i_blur = (self.falign_lc_image_gblur_width if is_lc
                  else self.falign_local_image_gblur_width)

        with self._map_lock.r_locked():
            depths, weights, poses_init, images, scalings = [], [], [], [], []
            for kf_ids in pair_list:
                if is_lc:
                    print("Loop closure at ", list(kf_ids))
                for fid in kf_ids:
                    depth = self.frames[fid].get_scaled_depth()
                    if is_lc and self.mode == "mono":
                        sc = 10 / np.median(depth)
                        depth = depth * sc
                        scalings.append(sc)
                    elif is_lc:
                        scalings.append(1.0)
                    depth = self._gblur(depth, d_blur)
                    depths.append(depth)
                    weights.append(self.frames[fid].depth_conf)
                    if not is_lc:
                        poses_init.append(T44_to_T6(
                            np.linalg.inv(self.frames[kf_ids[0]].Tcw)
                            @ self.frames[fid].Tcw
                        ))
                    if self.use_image_info:
                        if not self.image_loader_sync(fid):
                            raise RuntimeError(
                                "Image loader not working or files are missing."
                            )
                        images.append(self._gblur(self.images_grayf[fid], i_blur))

            P = len(pair_list)
            # pad the pair (lane) axis to the {4, 16} bucket (see the
            # chunking comment above). Pad lanes repeat pair 0 with zero
            # weights (inert).
            Pb = 4 if P <= 4 else 16
            for _ in range(Pb - P):
                depths += depths[:2]
                weights += [np.zeros_like(weights[0])] * 2
                if not is_lc:
                    poses_init += [np.zeros(6, np.float64)] * 2
                if self.use_image_info:
                    images += images[:2]

            def shape_pairs(lst):
                return np.stack(lst).reshape(Pb, 2, *lst[0].shape)

            kwargs = dict(
                depths=shape_pairs(depths),
                fx=self.fx, fy=self.fy, cx=self.cx, cy=self.cy,
                weights=shape_pairs(weights),
                optimize_7dof=self.mode == "mono",
                stride=stride,
                vbf=self.basefocal * self.falign_vbf_factor,
                crw=self.falign_crw,
            )
            def add_c2f(kw):
                # coarse-to-fine pays off only on PHOTO solves (slow, 40-100
                # lockstep iterations); geometry-only lanes converge in
                # 10-25 and the coarse phase is pure overhead there
                # (docs/PERF_FALIGN.json lc16_geo vs lc16_geo_c2f)
                if (self.falign_coarse_stride
                        and self.falign_coarse_stride > stride
                        and "images" in kw):
                    kw["coarse_stride"] = self.falign_coarse_stride
                    kw["fine_iters"] = self.falign_fine_iters
                return kw

            if is_lc:
                rets = falign_pairs(**kwargs)  # stage 1: geometry only
                if self.use_image_info:
                    kwargs["images"] = shape_pairs(images)
                    kwargs["poses_init"] = np.stack(
                        [r["poses_ret"] for r in rets]
                    )
                    rets = falign_pairs(**add_c2f(kwargs))  # stage 2: photo
            else:
                kwargs["poses_init"] = np.stack(poses_init).astype(
                    np.float32
                ).reshape(Pb, 2, 6)
                if self.use_image_info:
                    kwargs["images"] = shape_pairs(images)
                rets = falign_pairs(**add_c2f(kwargs))

            c_thr = (self.lc_link_consistency_thresh if is_lc
                     else self.mp_link_consistency_thresh)
            v_thr = (self.lc_link_visibility_thresh if is_lc
                     else self.mp_link_visibility_thresh)
            for i, kf_ids in enumerate(pair_list):
                sub = rets[i]
                consistency = np.nanmean(sub["consistency_mat"])
                visibility = np.nanmean(sub["visibility_mat"])
                gate_cv = consistency < c_thr or visibility < v_thr
                gate_rank = not gate_cv and bool(np.any(
                    np.linalg.matrix_rank(sub["poses_covar"].astype(np.float64))
                    != sub["poses_covar"].shape[1]
                ))
                self.metrics.log(
                    "lc_link" if is_lc else "local_link",
                    kf_ids=[int(k) for k in kf_ids],
                    consistency=round(float(consistency), 4),
                    visibility=round(float(visibility), 4),
                    accepted=not (gate_cv or gate_rank),
                    rejected_by="consistency/visibility" if gate_cv
                                else ("covar_rank" if gate_rank else None),
                )
                if is_lc:
                    tag = ", rejected" if (gate_cv or gate_rank) else ""
                    print(f"Loop closure registration score = "
                          f"{consistency:.4f} / {visibility:.4f}{tag}")
                if gate_cv or gate_rank:
                    continue
                med = (scalings[2 * i: 2 * i + 2]
                       if is_lc and self.mode == "mono" else None)
                self._append_falign_edges(
                    list(kf_ids), sub,
                    edge_type="falign-lc" if is_lc else "falign-local",
                    median_scaling=med,
                )

    def _append_falign_edges(self, kf_ids, falign_ret, edge_type, median_scaling=None):
        Tcw = T6_to_T44(falign_ret["poses_ret"])
        for i1 in range(len(kf_ids) - 1):
            for i2 in range(i1 + 1, len(kf_ids)):
                Tc1c2 = np.linalg.inv(Tcw[i2]) @ Tcw[i1]
                pose7 = np.zeros(7, np.float32)
                pose7[:6] = T44_to_T6(Tc1c2)
                sf1 = falign_ret["scaling_factor"][i1]
                sf2 = falign_ret["scaling_factor"][i2]
                if median_scaling is not None:
                    sf1 = sf1 * median_scaling[i1]
                    sf2 = sf2 * median_scaling[i2]
                f1_scale = self.frames[kf_ids[i1]].scale * sf1
                f2_scale = self.frames[kf_ids[i2]].scale * sf2
                pose7[6] = np.log(f2_scale / f1_scale)
                self.edges.append(
                    Edge(kf_ids[i1], kf_ids[i2], pose7, falign_ret["poses_covar"][i2],
                         pose_eval_time_scale=float(np.sqrt(f1_scale * f2_scale)),
                         edge_type=edge_type)
                )

    def establish_lc_links(self, kf_ids):
        """(voldor_slam.py:597-675) — two-stage: geometry-only then
        photometric refinement; mono pre-normalizes depth medians to 10."""
        self.establish_links_batch([tuple(kf_ids)], kind="lc")

    # ------------------------------------------------------------------
    def append_kf(self, fid):
        """(voldor_slam.py:678-701)"""
        self.frames[fid].is_keyframe = True
        self.kf_ids.append(fid)

        if self._use_loop_closure:
            if not self.image_loader_sync(fid):
                raise RuntimeError("Image loader not working or files are missing.")
            img = self.images_bgri[fid]
            kps, des = self.feature_detector.detectAndCompute(img, None)
            self.frames[fid].kps = kps
            self.frames[fid].des = des
            import cv2

            gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            # cold-start schedule: same retrieval bar, stricter geometry
            # bar until the vocabulary trains (see __init__ rationale)
            geo_thresh = (
                self.lc_geo_inlier_thresh
                if getattr(self.retriever, "trained", True)
                else self.lc_geo_inlier_cold_thresh
            )
            for rid, score in self.retriever.query_frame(gray, des):
                if score > self.lc_bow_score_thresh:
                    if len(self.kf_ids) - rid < self.lc_min_kf_distance:
                        continue
                    other = self.frames[self.kf_ids[rid]]
                    if des is None or other.des is None:
                        continue
                    inlier_rate = geometry_check(kps, des, other.kps, other.des)
                    if inlier_rate > geo_thresh:
                        self.lc_candidates.append((rid, len(self.kf_ids) - 1))
            self.retriever.add_frame(gray, des)

    # ------------------------------------------------------------------
    def vo_thread(self):
        """(voldor_slam.py:708-727)"""
        print("VO thread started")
        print(f"VO mode = {self.mode}")
        self.end_of_vo = False
        while self.process_vo():
            self._viewer_signal_map_changed = True
            while self._block_vo_signal:
                time.sleep(0.01)
        self.end_of_vo = True
        print("VO thread ended.")
        print(f"{len(self.kf_ids)} keyframes registered.")

    def _aot_warmup_worker(self):
        """Pre-compile the falign/PGO executable lattice on inert inputs of
        the real map shape while the first VO windows run. The early
        windows only need the VO solve fn; without this, each falign/PGO
        executable compiles serially at its FIRST real use mid-run, with
        the VO thread stalled behind the mapping scheduler
        (docs/PERF_SLAM_PHASES.json cold pass: 60-90 s per falign variant,
        block_vo_stall_s ~90). Device time per warmup call is milliseconds
        (flat depth, residuals converge in one chunk); only the compiles
        matter. Concurrent first-use of the same program is safe (jit
        dedups in-flight compiles)."""
        try:
            from voldor_tpu.falign.api import falign_pairs
            from voldor_tpu.pgo.api import pgo
            from voldor_tpu.vo.api import voldor_dispatch

            h, w = int(self.h), int(self.w)

            # VO priors-variant executables FIRST (they block earliest):
            # window 0 only needs the no-priors solve, which the VO thread
            # itself compiles from t=0 — but the first keyframe's window
            # switches to the depth-priors solve and, without this, pays
            # its ~90 s compile serially mid-run (docs/PERF_SLAM_PHASES
            # cold process_vo call 6). D=1 (tmpkf only) and D=2
            # (tmpkf+spakf) stack priors to (D, h, w) and are distinct
            # executables; the covis spakf gate variant rides along.
            import jax.numpy as jnp

            from voldor_tpu.vo.engine import DeviceMap

            cfgstr = (self.voldor_config + " " + self.voldor_user_config
                      + (" --save_everything" if self.debug_dir else ""))
            inert_flows = [np.zeros((h, w, 2), np.float32)
                           for _ in range(self.voldor_winsize)]
            inert_map = jnp.full((h, w), 10.0, jnp.float32)
            inert_conf = jnp.ones((h, w), jnp.float32)
            for D in (1, 2):
                covis = {"conf_thresh": self.depth_covis_conf_thresh}
                if D == 2:
                    # steady state: a distinct spatial keyframe gates
                    # window stepping (device-handle maps, like process_vo)
                    covis["spakf"] = (inert_map, inert_conf, 1.0, np.eye(4))
                voldor_dispatch(
                    flows=inert_flows,
                    fx=self.fx, fy=self.fy, cx=self.cx, cy=self.cy,
                    basefocal=self.basefocal,
                    disparity=(np.ones((h, w), np.float32)
                               if self.mode == "stereo" else None),
                    depth_priors=[DeviceMap(inert_map, 1.0)] * D,
                    depth_prior_pconfs=[inert_conf] * D,
                    depth_prior_poses=np.zeros((D, 6), np.float32),
                    config=cfgstr,
                    pad_window_to=self.voldor_winsize,
                    poses_init=np.zeros((self.voldor_winsize, 6), np.float32),
                    covis_spec=covis,
                    host_copies=False,
                )
            base = dict(
                fx=self.fx, fy=self.fy, cx=self.cx, cy=self.cy,
                optimize_7dof=self.mode == "mono",
                vbf=self.basefocal * self.falign_vbf_factor,
                crw=self.falign_crw,
            )
            s_local = self.falign_local_link_stride
            s_lc = self.falign_lc_link_stride
            cs = self.falign_coarse_stride

            def c2f(kw, stride):
                if cs and cs > stride and "images" in kw:
                    kw["coarse_stride"] = cs
                    kw["fine_iters"] = self.falign_fine_iters
                return kw

            for P in (4, 16):
                d = np.full((P, 2, h, w), 10.0, np.float32)
                wt = np.ones_like(d)
                im = np.zeros_like(d)
                if self.use_image_info:
                    falign_pairs(**c2f(dict(depths=d, weights=wt, images=im,
                                            stride=s_local, **base), s_local))
                    falign_pairs(**c2f(dict(depths=d, weights=wt, images=im,
                                            stride=s_lc, **base), s_lc))
                else:
                    falign_pairs(depths=d, weights=wt, stride=s_local, **base)
                # the LC geometry stage (photo off) runs either way
                falign_pairs(depths=d, weights=wt, stride=s_lc, **base)

            # PGO dense executable at the (pose, edge) bucket floor
            poses = np.zeros((2, 7), np.float32)
            poses[1, 5] = 1.0
            epose = np.zeros((1, 7), np.float32)
            epose[0, 5] = -1.0
            pgo(poses, np.asarray([[0, 1]], np.int32), epose,
                np.tile(np.eye(7, dtype=np.float32), (1, 1, 1)),
                optimize_7dof=self.mode == "mono")
            print("AOT warmup done")
        except Exception as e:  # noqa: BLE001 — warmup must never kill a run
            print(f"AOT warmup error (non-fatal): {e!r}")

    def mapping_thread(self):
        """(voldor_slam.py:729-828)"""
        print("Mapping thread started")
        if self.aot_warmup:
            threading.Thread(target=self._aot_warmup_worker,
                             daemon=True).start()
        n_kfs_registered = 0
        next_pgo_kfid = self.pgo_refine_kf_interval
        # link_mask/priority_mat are indexed by KEYFRAME ordinals, so size
        # them by keyframe capacity with geometric growth — an
        # (N_FRAMES, N_FRAMES) allocation would waste ~165 MB at KITTI-00
        # scale (4,541 frames vs ~300 keyframes) and required N_FRAMES to
        # be known before the mapping thread starts.
        kf_cap = 256
        link_mask = np.zeros((kf_cap, kf_cap), bool)
        priority_mat = np.zeros((kf_cap, kf_cap), np.float32)

        def _ensure_capacity(n):
            nonlocal kf_cap, link_mask, priority_mat
            if n <= kf_cap:
                return
            while kf_cap < n:
                kf_cap *= 2
            lm = np.zeros((kf_cap, kf_cap), bool)
            pm = np.zeros((kf_cap, kf_cap), np.float32)
            lm[: link_mask.shape[0], : link_mask.shape[1]] = link_mask
            pm[: priority_mat.shape[0], : priority_mat.shape[1]] = priority_mat
            link_mask, priority_mat = lm, pm

        lc_pairs = set()
        new_local_link_flag = False
        new_lc_link_flag = False
        n_lc_seen = 0

        def _merge_lc_candidates(n_kfs_cur):
            # Fold lc_candidates into the priority matrix. The reference
            # only does this when a NEW keyframe registers
            # (voldor_slam.py:775-780) — but append_kf publishes kf_ids
            # before lc_candidates, so a candidate discovered by the LAST
            # keyframe can land after the registration pass already read
            # the list and is then never scheduled (the priority matrix is
            # only rebuilt on the next registration). Calling this from the
            # idle branch too closes that race.
            nonlocal n_lc_seen
            updated = False
            for f1, f2 in self.lc_candidates[:]:
                for ff1, ff2 in [
                    (f1, f2), (f1 + 1, f2), (f1 - 1, f2), (f1, f2 + 1), (f1, f2 - 1)
                ]:
                    if 0 <= ff1 < n_kfs_cur and 0 <= ff2 < n_kfs_cur:
                        pri = np.exp(
                            -((abs(ff1 - f1) + abs(ff2 - f2)) / self.mp_lc_sigma) ** 2
                        )
                        if not link_mask[ff1, ff2] and pri > priority_mat[ff1, ff2]:
                            priority_mat[ff1, ff2] = pri
                            updated = True
                        lc_pairs.add((ff1, ff2))
            n_lc_seen = len(self.lc_candidates)
            return updated

        # Local links COALESCE across registrations before dispatching:
        # the batched falign's cost is dominated by the lockstep coarse
        # phase, so a 1-pair dispatch costs ~1.8 s while a full 16-batch
        # costs ~0.17 s/pair (docs/PERF_FALIGN.json) — dribbling each
        # registration's 1-5 pending cells immediately (the reference's
        # one-problem-per-tick host loop, voldor_slam.py:748-760, where
        # each GPU problem is ~30 ms) is the wrong shape for this
        # hardware. Pending locals flush when the batch fills, when a PGO
        # needs their edges, when they age out, or at end of run. LC links
        # stay immediate (rare, high-value).
        pending_local: list = []
        pending_since = [0.0]

        def _process_pending(thresh, flush=False):
            nonlocal new_local_link_flag, new_lc_link_flag
            Iy, Ix = np.where((priority_mat > thresh) & ~link_mask)
            lc_pair_list = []
            for y, x in zip(Iy, Ix):
                pair = (self.kf_ids[y], self.kf_ids[x])
                if (int(y), int(x)) in lc_pairs:
                    lc_pair_list.append(pair)
                else:
                    if not pending_local:
                        pending_since[0] = time.perf_counter()
                    pending_local.append(pair)
                link_mask[y, x] = True
                priority_mat[y, x] = 0
            ran = False
            if lc_pair_list:
                self.establish_links_batch(lc_pair_list, kind="lc")
                new_lc_link_flag = True
                ran = True
            aged = (pending_local
                    and time.perf_counter() - pending_since[0]
                    > self.mp_link_max_delay_s)
            if pending_local and (
                flush or aged or len(pending_local) >= self.mp_link_batch_min
            ):
                self.establish_links_batch(pending_local, kind="local")
                pending_local.clear()
                new_local_link_flag = True
                ran = True
            return ran

        while not self.end_of_vo or n_kfs_registered < len(self.kf_ids):
            n_kfs_cur = len(self.kf_ids)
            if n_kfs_cur == 0:
                time.sleep(0.01)
                continue
            _ensure_capacity(n_kfs_cur)

            if n_kfs_registered == n_kfs_cur:
                if n_lc_seen < len(self.lc_candidates):
                    _merge_lc_candidates(n_kfs_cur)
                if not _process_pending(self.mp_no_link_thresh,
                                        flush=self.end_of_vo):
                    time.sleep(0.01)
            else:
                # VO blocks only for the registration BOOKKEEPING (priority
                # rebuild + LC merge — microseconds); the falign link
                # solves and the PGO run with VO live. solve_pgo snapshots
                # and rebases internally, and _map_version invalidates any
                # in-flight window either way. (Previously this block
                # spanned the solves too: ~28 s of a 49 s warm run was the
                # VO thread waiting on _block_vo_signal,
                # docs/PERF_SLAM_PHASES.json.)
                self._block_vo_signal = True
                priority_mat[...] = 0

                if not self.disable_local_mapping:
                    for f1 in range(max(0, n_kfs_cur - 2 * self.mp_temporal_sigma), n_kfs_cur):
                        for f2 in range(f1 + 1, min(n_kfs_cur, f1 + 2 * self.mp_spatial_sigma)):
                            priority_mat[f1, f2] = max(
                                priority_mat[f1, f2],
                                np.exp(
                                    -((f1 - f2) / self.mp_spatial_sigma) ** 2
                                    - (
                                        (n_kfs_cur - f1)
                                        * (n_kfs_cur - f2)
                                        / self.mp_temporal_sigma**2
                                    )
                                ),
                            )

                _merge_lc_candidates(n_kfs_cur)

                priority_mat[link_mask] = 0
                n_kfs_registered = n_kfs_cur
                self._block_vo_signal = False

                pgo_due = n_kfs_cur >= next_pgo_kfid
                _process_pending(self.mp_realtime_link_thresh, flush=pgo_due)

                if pgo_due and (new_local_link_flag or new_lc_link_flag):
                    if new_lc_link_flag:
                        self.solve_pgo()
                    else:
                        self.solve_pgo(
                            self.kf_ids[0 if self.pgo_local_kf_winsize > n_kfs_cur else -self.pgo_local_kf_winsize]
                        )
                    self._viewer_signal_map_changed = True
                    new_local_link_flag = False
                    new_lc_link_flag = False
                    next_pgo_kfid = n_kfs_cur + self.pgo_refine_kf_interval

        # Drain the remaining above-threshold links before the final global
        # PGO (the reference exits the loop as soon as VO ends and silently
        # drops still-pending cells — including a loop closure discovered by
        # the last keyframe, voldor_slam.py:743/825-828).
        n_kfs_cur = len(self.kf_ids)
        _merge_lc_candidates(n_kfs_cur)
        _process_pending(self.mp_no_link_thresh, flush=True)

        self.solve_pgo()
        self._viewer_signal_map_changed = True
        print("Mapping thread end.")


def _quat_xyzw_from_R(R):
    from voldor_tpu.slam.slam_utils import R_to_rvec

    rvec = R_to_rvec(R)
    theta = np.linalg.norm(rvec)
    if theta < 1e-12:
        return np.asarray([0.0, 0.0, 0.0, 1.0])
    axis = rvec / theta
    return np.asarray(
        [*(axis * np.sin(theta / 2)), np.cos(theta / 2)]
    )
