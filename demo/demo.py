"""VOLDOR-SLAM demo CLI — same flags and thread wiring as the reference
(demo/demo.py:3-85), driving the TPU-native engines."""

import argparse
import os
import sys

# Make `python demo/demo.py` work from a source checkout without an
# install step (the reference is likewise run in-tree, README.md:110-137).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser(description="VOLDOR-SLAM (TPU) demo script")
parser.add_argument("--mode", type=str, required=True,
                    help="One of stereo/mono-scaled/mono. stereo and mono-scaled need disparity input.")
parser.add_argument("--flow_dir", type=str, required=True)
parser.add_argument("--disp_dir", type=str)
parser.add_argument("--img_dir", type=str)
parser.add_argument("--fx", type=float, required=True)
parser.add_argument("--fy", type=float, required=True)
parser.add_argument("--cx", type=float, required=True)
parser.add_argument("--cy", type=float, required=True)
parser.add_argument("--bf", type=float, default=0,
                    help="Baseline x focal (world scale). 0 = auto virtual baseline.")
parser.add_argument("--resize", type=float, default=0.5)
parser.add_argument("--abs_resize", type=float,
                    help="Resize factor relative to the flow network's native size.")
parser.add_argument("--enable_loop_closure", type=str, default=None, nargs="?", const="builtin")
parser.add_argument("--enable_mapping", action="store_true")
parser.add_argument("--save_poses", type=str)
parser.add_argument("--save_depths", type=str)
parser.add_argument("--save_ply", type=str)
parser.add_argument("--save_map", type=str, help="write a resumable map checkpoint at the end")
parser.add_argument("--load_map", type=str, help="resume from a map checkpoint")
parser.add_argument("--viewer", action="store_true",
                    help="open the interactive GL map window (needs DISPLAY)")
parser.add_argument("--metrics", type=str,
                    help="write per-window/link/PGO JSON-line metrics to this file")
parser.add_argument("--debug_dir", type=str,
                    help="dump per-window debug artifacts (rigidness mosaics, "
                         "inverse depth, confidences) to this directory "
                         "(reference --debug, voldor.cpp:378-396)")

opt = parser.parse_args()
if opt.abs_resize is None:
    opt.abs_resize = opt.resize

import faulthandler
import threading

# Stall watchdog: long-running headless runs (tools/long_run.py) need a
# way to see where the threads are if progress stops; periodic full
# tracebacks to stderr are cheap and disabled by default.
if os.environ.get("VOLDOR_WATCHDOG"):
    faulthandler.dump_traceback_later(
        int(os.environ["VOLDOR_WATCHDOG"]), repeat=True)

from voldor_tpu.slam.system import VOLDOR_SLAM
from voldor_tpu.slam.viewer import VOLDOR_Viewer

if __name__ == "__main__":
    print(opt)

    slam = VOLDOR_SLAM(mode=opt.mode)
    slam.set_cam_params(opt.fx, opt.fy, opt.cx, opt.cy, opt.bf, rescale=opt.resize)
    slam.voldor_user_config = f"--abs_resize_factor {opt.abs_resize}"
    if opt.metrics:
        slam.metrics.open(opt.metrics)
    if opt.debug_dir:
        slam.debug_dir = opt.debug_dir

    if opt.enable_loop_closure is not None:
        # bare --enable_loop_closure -> built-in online vocabulary;
        # --enable_loop_closure PATH -> DBoW text vocabulary (ORBvoc.txt)
        slam.enable_loop_closure(
            None if opt.enable_loop_closure == "builtin"
            else opt.enable_loop_closure
        )

    if opt.load_map:
        from voldor_tpu.slam.checkpoint import load_map

        load_map(slam, opt.load_map)

    threading.Thread(
        target=slam.flow_loader,
        kwargs={"flow_path": opt.flow_dir, "resize": opt.resize},
        daemon=True,
    ).start()
    slam.flow_loader_sync(0, block_when_uninit=True)

    if opt.img_dir is not None:
        threading.Thread(
            target=slam.image_loader, kwargs={"image_path": opt.img_dir}, daemon=True
        ).start()
        slam.image_loader_sync(0, block_when_uninit=True)
        slam.use_image_info = True
    else:
        slam.use_image_info = False

    if opt.disp_dir is not None:
        threading.Thread(
            target=slam.disp_loader, kwargs={"disp_path": opt.disp_dir}, daemon=True
        ).start()
        slam.disp_loader_sync(0, block_when_uninit=True)

    # Live GL window when requested AND a display exists; headless watch
    # loop otherwise (same data path either way — gl_viewer.py docstring).
    from voldor_tpu.slam.gl_viewer import GLViewer

    gl = None
    if opt.viewer and GLViewer.available():
        gl = GLViewer(slam)
    elif opt.viewer:
        print("Note: --viewer requested but no DISPLAY/PyOpenGL; headless.")
    viewer = VOLDOR_Viewer(slam)
    if gl is None:
        viewer_thread = threading.Thread(target=viewer.start, daemon=True)
        viewer_thread.start()

    vo_thread = threading.Thread(target=slam.vo_thread)
    vo_thread.start()
    if opt.enable_mapping:
        mapping_thread = threading.Thread(target=slam.mapping_thread)
        mapping_thread.start()

    _epilogue_done = [False]

    def _epilogue():
        # idempotent: runs on the normal path AND from the GL viewer's
        # hard-exit 'q' handler (classic GLUT cannot leave its main loop)
        if _epilogue_done[0]:
            return
        _epilogue_done[0] = True
        if opt.save_poses is not None:
            slam.save_poses(opt.save_poses, format="KITTI")
        if opt.save_depths is not None:
            slam.save_depth_maps(opt.save_depths)
        if opt.save_ply is not None:
            viewer.save_ply(opt.save_ply)
        if opt.save_map is not None:
            from voldor_tpu.slam.checkpoint import save_map

            save_map(slam, opt.save_map)

    if gl is not None:
        gl.on_exit = _epilogue
        # polls with freeglut: returns on 'q' or when the SLAM threads are
        # done, so the epilogue below still runs (classic GLUT: the 'q'
        # handler runs _epilogue itself before os._exit)
        gl.start(
            done=lambda: not vo_thread.is_alive()
            and (not opt.enable_mapping or not mapping_thread.is_alive())
        )

    vo_thread.join()
    if opt.enable_mapping:
        mapping_thread.join()

    _epilogue()
