"""Native C++ flow loader: build, correctness, prefetch behavior."""

import numpy as np
import pytest

from voldor_tpu.utils.flow_io import save_flow


@pytest.fixture
def flow_dir(tmp_path, rng):
    flows = rng.normal(0, 4, (12, 24, 32, 2)).astype(np.float32)
    d = tmp_path / "flows"
    d.mkdir()
    for i in range(12):
        save_flow(str(d / f"{i:06d}.flo"), flows[i])
    return d, flows


def test_native_loader_matches_files(flow_dir):
    from voldor_tpu.native.io import NativeFlowDir

    d, flows = flow_dir
    src = NativeFlowDir(str(d), n_prefetch=4, n_threads=2)
    assert src.native, "native loader should build in this environment"
    assert len(src) == 12
    assert (src.h, src.w) == (24, 32)
    # sequential access (the VO pattern)
    for i in range(12):
        np.testing.assert_array_equal(src.get(i), flows[i])
    # random lookback after eviction must still work (synchronous re-read)
    np.testing.assert_array_equal(src.get(0), flows[0])
    np.testing.assert_array_equal(src.get(7), flows[7])
    src.close()


def test_native_loader_range(flow_dir):
    from voldor_tpu.native.io import NativeFlowDir

    d, flows = flow_dir
    src = NativeFlowDir(str(d), range=(3, 8))
    assert len(src) == 5
    np.testing.assert_array_equal(src.get(0), flows[3])
    np.testing.assert_array_equal(src.get(4), flows[7])
    src.close()


def test_native_loader_out_of_range(flow_dir):
    from voldor_tpu.native.io import NativeFlowDir

    d, _ = flow_dir
    src = NativeFlowDir(str(d))
    with pytest.raises(IOError):
        src.get(99)
    src.close()


def test_disp_loader_flo_native_path(flow_dir):
    """SLAM disparity loader over a .flo directory (KITTI stereo: disparity
    = negated x-flow, voldor_slam.py:302-309) rides the native prefetcher
    and must produce exactly -flow[..., 0]."""
    from voldor_tpu.slam.system import VOLDOR_SLAM

    d, flows = flow_dir
    slam = VOLDOR_SLAM(mode="stereo")
    slam.h, slam.w = 24, 32
    slam.flow_loader_pt = 1  # loader gate: disparity waits on flow IO
    slam.N_FRAMES = 13
    slam.disp_loader(str(d))
    assert len(slam.disps) == 12
    for i in range(12):
        np.testing.assert_array_equal(
            slam.disps[i], -flows[i][..., 0]
        )
