"""Loop-closure retrieval backends + g2o pose-graph IO."""

import numpy as np
import pytest

from voldor_tpu.slam.loop_closure import BowRetriever, ThumbnailRetriever


def _scene_image(rng, seed_shift=0.0):
    """A textured image; seed_shift shifts the texture phase (viewpoint-ish)."""
    ys, xs = np.mgrid[0:48, 0:64].astype(np.float32)
    img = (
        128
        + 60 * np.sin(0.3 * xs + seed_shift)
        + 50 * np.cos(0.23 * ys + 0.5 * seed_shift)
        + rng.normal(0, 5, (48, 64))
    )
    return np.clip(img, 0, 255).astype(np.float32)


def test_thumbnail_retriever_finds_revisit(rng):
    r = ThumbnailRetriever()
    # 10 distinct "places"
    places = [_scene_image(rng, s) for s in np.linspace(0, 20, 10)]
    for p in places:
        r.add(p)
    # revisit place 3 with mild noise
    query = places[3] + rng.normal(0, 4, places[3].shape).astype(np.float32)
    results = r.query(query)
    assert results[0][0] == 3
    assert results[0][1] > 0.8


def test_bow_retriever_orb(rng):
    cv2 = pytest.importorskip("cv2")
    orb = cv2.ORB_create()
    r = BowRetriever(n_words=256)
    rng2 = np.random.default_rng(5)
    descs = []
    for s in np.linspace(0, 25, 8):
        img = _scene_image(rng2, s).astype(np.uint8)
        img = cv2.resize(img, (256, 192))
        _, des = orb.detectAndCompute(img, None)
        if des is None:
            des = rng2.integers(0, 256, (10, 32), dtype=np.uint8)
        descs.append(des)
        r.add(des)
    results = r.query(descs[2])
    assert results[0][0] == 2


def test_g2o_roundtrip(tmp_path):
    from voldor_tpu.pgo.g2o import read_g2o, write_g2o
    from voldor_tpu.pgo.api import pgo

    # hand-write a tiny g2o file: 3 vertices on a line + 2 edges
    lines = [
        "VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1",
        "VERTEX_SE3:QUAT 1 1.1 0 0 0 0 0 1",  # off by 0.1
        "VERTEX_SE3:QUAT 2 2 0 0 0 0 0 1",
        # information: identity upper triangle (21 values)
        "EDGE_SE3:QUAT 0 1 1 0 0 0 0 0 1 "
        + "100 0 0 0 0 0 100 0 0 0 0 100 0 0 0 100 0 0 100 0 100",
        "EDGE_SE3:QUAT 1 2 1 0 0 0 0 0 1 "
        + "100 0 0 0 0 0 100 0 0 0 0 100 0 0 0 100 0 0 100 0 100",
        "EDGE_SE3:QUAT 0 2 2 0 0 0 0 0 1 "
        + "100 0 0 0 0 0 100 0 0 0 0 100 0 0 0 100 0 0 100 0 100",
    ]
    p = tmp_path / "g.g2o"
    p.write_text("\n".join(lines) + "\n")

    ids, poses7, e_idx, e_pose, e_cov = read_g2o(str(p))
    assert list(ids) == [0, 1, 2]
    assert e_idx.shape == (3, 2)

    out = pgo(poses7, e_idx, e_pose, e_cov, poses_idx=ids.astype(np.int32))
    # optimized graph: vertex 1 pulled back toward x=1
    assert abs(out[1, 3] - 1.0) < 0.05
    assert abs(out[2, 3] - 2.0) < 0.05

    q = tmp_path / "out.g2o"
    write_g2o(str(q), ids, out)
    ids2, poses2, *_ = read_g2o(str(q))
    np.testing.assert_allclose(poses2[:, 3:6], out[:, 3:6], atol=1e-5)
