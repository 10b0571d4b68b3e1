"""Loop-closure retrieval backends + g2o pose-graph IO."""

import os

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


def _textured_place(rng, seed):
    """A 192x256 image with place-specific blob + gradient texture (enough
    structure for ORB corners and distinct global appearance)."""
    h, w = 192, 256
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 120 + 40 * np.sin(0.11 * xs + 2.1 * seed) + 35 * np.cos(0.13 * ys - seed)
    r = np.random.default_rng(1000 + seed)
    for _ in range(25):  # high-contrast blobs = ORB corners
        cy, cx = r.integers(10, h - 10), r.integers(10, w - 10)
        rad = int(r.integers(3, 9))
        img[cy - rad : cy + rad, cx - rad : cx + rad] += float(r.uniform(-90, 90))
    img += rng.normal(0, 3, (h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def _perturb(img, rng):
    """Viewpoint-ish query perturbation: shift + brightness + noise."""
    out = np.roll(img, (3, 5), axis=(0, 1)).astype(np.float32)
    out = out * 1.08 + 6 + rng.normal(0, 4, img.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


def test_retrieval_precision_both_backends(rng):
    """Precision@1 on ground-truth revisits, through the uniform frame
    interface used by append_kf (query_frame/add_frame)."""
    cv2 = pytest.importorskip("cv2")
    orb = cv2.ORB_create()

    n_places = 12
    places = [_textured_place(rng, s) for s in range(n_places)]
    descs = []
    for img in places:
        _, des = orb.detectAndCompute(img, None)
        assert des is not None and len(des) >= 8, "scene must produce ORB features"
        descs.append(des)

    retrievers = {"thumb": ThumbnailRetriever(), "bow": BowRetriever(n_words=256)}
    for name, r in retrievers.items():
        for img, des in zip(places, descs):
            r.add_frame(img.astype(np.float32), des)

    hits = {name: 0 for name in retrievers}
    for gt_id, img in enumerate(places):
        q = _perturb(img, rng)
        _, qdes = orb.detectAndCompute(q, None)
        for name, r in retrievers.items():
            res = r.query_frame(q.astype(np.float32), qdes)
            if res and res[0][0] == gt_id:
                hits[name] += 1

    precision = {k: v / n_places for k, v in hits.items()}
    # Measured on this harness: bow 0.92, thumb 0.75 (the thumbnail cosine
    # is shift-sensitive — why BowRetriever is the default backend). Bars
    # sit just under the measured values to catch retrieval regressions.
    assert precision["bow"] >= 0.8, precision
    assert precision["thumb"] >= 0.6, precision


def test_append_kf_works_with_bow_retriever(rng):
    """append_kf must work with the descriptor-based backend (the round-1
    wiring passed a grayscale image into BowRetriever.query)."""
    cv2 = pytest.importorskip("cv2")
    from voldor_tpu.slam.frame import Frame
    from voldor_tpu.slam.system import VOLDOR_SLAM

    slam = VOLDOR_SLAM(mode="mono")
    slam.set_cam_params(80.0, 80.0, 128.0, 96.0)
    # train on the first frame's descriptors so the trained-vocab default
    # threshold applies (the cold-start schedule has its own test below)
    slam.enable_loop_closure(
        retriever=BowRetriever(n_words=128, train_min_descriptors=1)
    )
    slam.lc_min_kf_distance = 0  # tiny map: allow close revisits
    slam.image_loader_sync = lambda fid, **kw: True

    imgs = [_textured_place(rng, s) for s in (0, 1, 0)]  # frame 2 revisits 0
    slam.images_bgri = [cv2.cvtColor(i, cv2.COLOR_GRAY2BGR) for i in imgs]
    slam.frames = [Frame(np.eye(4)) for _ in imgs]

    for fid in range(3):
        slam.append_kf(fid)
    assert len(slam.retriever) == 3
    # the revisit should surface as an LC candidate (2 -> 0)
    assert any(rid == 0 and qid == 2 for rid, qid in slam.lc_candidates)


def test_lc_cold_start_geometry_schedule(rng):
    """Until the BoW vocabulary's first k-majority fit, append_kf keeps the
    retrieval bar (recall is unrecoverable downstream) but gates candidates
    at the STRICTER cold geometry-inlier threshold (docs/LC_PR.json
    bow_random: P=0.57 at the 0.55 retrieval bar — the precision is
    recovered geometrically, not by blinding retrieval; a pure-BoW 0.68
    cold threshold cost recall 0.83->0.43 and produced zero LC edges on
    the 60-frame bench scene). VERDICT r3 #7."""
    cv2 = pytest.importorskip("cv2")
    from voldor_tpu.slam.frame import Frame
    from voldor_tpu.slam.system import VOLDOR_SLAM

    slam = VOLDOR_SLAM(mode="mono")
    slam.set_cam_params(80.0, 80.0, 128.0, 96.0)
    # never trains inside this test: stays in the cold-start regime
    slam.enable_loop_closure(
        retriever=BowRetriever(n_words=128, train_min_descriptors=10**9)
    )
    slam.lc_min_kf_distance = 0
    slam.image_loader_sync = lambda fid, **kw: True

    imgs = [_textured_place(rng, s) for s in (0, 1)]
    imgs.append(imgs[0].copy())  # frame 2: EXACT revisit of frame 0
    slam.images_bgri = [cv2.cvtColor(i, cv2.COLOR_GRAY2BGR) for i in imgs]
    slam.frames = [Frame(np.eye(4)) for _ in imgs]

    seen_geo = []
    import voldor_tpu.slam.system as S

    orig_geo = S.geometry_check

    def spy(*a, **kw):
        r = orig_geo(*a, **kw)
        seen_geo.append(r)
        return r

    S.geometry_check = spy
    try:
        for fid in range(3):
            slam.append_kf(fid)
    finally:
        S.geometry_check = orig_geo

    assert not slam.retriever.trained
    # an exact revisit of an identical image passes even the strict cold
    # geometry bar, so the true loop (2 -> 0) still surfaces
    assert any(rid == 0 and qid == 2 for rid, qid in slam.lc_candidates)
    # every accepted candidate cleared the COLD geometry bar — inlier
    # rates in (0.4, 0.5] must NOT have produced candidates while cold
    n_clearing_cold = sum(
        1 for g in seen_geo if g > slam.lc_geo_inlier_cold_thresh
    )
    assert len(slam.lc_candidates) <= n_clearing_cold
    assert slam.lc_geo_inlier_cold_thresh > slam.lc_geo_inlier_thresh


def _write_tiny_vocab(path, k=2, L=2):
    """A k=2, L=2 DBoW-text vocabulary: 2 internal nodes, 4 leaf words.

    Left subtree lives near 0x00 descriptors, right subtree near 0xFF —
    greedy tree descent and brute-force nearest-leaf agree by construction.
    """
    words = np.array([
        [0x00] * 32,                     # word 0 (leaf of node 1)
        [0x0F] * 32,                     # word 1 (leaf of node 1)
        [0xF0] * 32,                     # word 2 (leaf of node 2)
        [0xFF] * 32,                     # word 3 (leaf of node 2)
    ], np.uint8)
    internal = np.array([[0x03] * 32, [0xFC] * 32], np.uint8)
    lines = [f"{k} {L} 0 0"]
    # nodes 1, 2: children of root, internal
    for d in internal:
        lines.append("0 0 " + " ".join(str(b) for b in d) + " 0")
    # nodes 3, 4 under node 1; nodes 5, 6 under node 2 — all leaves
    for parent, w in ((1, 0), (1, 1), (2, 2), (2, 3)):
        lines.append(
            f"{parent} 1 " + " ".join(str(b) for b in words[w])
            + f" {0.1 * (w + 1):.3f}"
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return words


def test_dbow_text_vocabulary_loads_and_quantizes(tmp_path):
    """The DBoW2/ORB-SLAM text format loads into a TreeVocabulary whose
    greedy descent matches brute-force nearest-leaf on descriptors near
    each word (reference: enable_loop_closure's voc.load,
    voldor_slam.py:340-359)."""
    from voldor_tpu.slam.loop_closure import load_dbow_text_vocabulary

    path = tmp_path / "tinyvoc.txt"
    words = _write_tiny_vocab(path)
    voc = load_dbow_text_vocabulary(str(path))
    assert (voc.k, voc.L, voc.n_words) == (2, 2, 4)
    np.testing.assert_allclose(voc.word_weights, [0.1, 0.2, 0.3, 0.4],
                               rtol=1e-5)
    # exact word descriptors map to their own word id
    assert voc.quantize(words).tolist() == [0, 1, 2, 3]
    # single-bit perturbations stay on the same word
    rng = np.random.default_rng(5)
    for w in range(4):
        d = words[w].copy()
        d[rng.integers(32)] ^= 1 << rng.integers(8)
        assert int(voc.quantize(d[None])[0]) == w


def test_dbow_binary_vocabulary_roundtrip(tmp_path):
    """The ORBvoc.bin layout (ORB-SLAM2 loadFromBinaryFile forks — the
    artifact pyDBoW3 consumes in the reference, voldor_slam.py:340-359)
    round-trips through save_dbow_binary_vocabulary with identical tree
    structure, weights, and word-id assignment as the text loader."""
    from voldor_tpu.slam.loop_closure import (load_dbow_binary_vocabulary,
                                              load_dbow_text_vocabulary,
                                              load_vocabulary,
                                              save_dbow_binary_vocabulary)

    tpath = tmp_path / "tinyvoc.txt"
    words = _write_tiny_vocab(tpath)
    voc_t = load_dbow_text_vocabulary(str(tpath))
    bpath = tmp_path / "tinyvoc.bin"
    save_dbow_binary_vocabulary(voc_t, str(bpath))
    # header: 6 internal+leaf nodes x 41 bytes + 24-byte header
    assert bpath.stat().st_size == 24 + 6 * 41
    voc_b = load_dbow_binary_vocabulary(str(bpath))
    assert (voc_b.k, voc_b.L, voc_b.n_words) == (voc_t.k, voc_t.L,
                                                 voc_t.n_words)
    np.testing.assert_array_equal(voc_b.children, voc_t.children)
    np.testing.assert_array_equal(voc_b.node_des, voc_t.node_des)
    np.testing.assert_array_equal(voc_b.leaf_word, voc_t.leaf_word)
    np.testing.assert_allclose(voc_b.word_weights, voc_t.word_weights,
                               rtol=1e-6)
    assert voc_b.quantize(words).tolist() == [0, 1, 2, 3]
    # the sniffing entry point routes both forms
    assert load_vocabulary(str(bpath)).n_words == 4
    assert load_vocabulary(str(tpath)).n_words == 4


def test_dbow_binary_vocabulary_rejects_malformed(tmp_path):
    from voldor_tpu.slam.loop_closure import load_dbow_binary_vocabulary

    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"definitely not a vocabulary file at all")
    with pytest.raises(ValueError):
        load_dbow_binary_vocabulary(str(bad))


def test_dbow_vocabulary_rejects_malformed(tmp_path):
    from voldor_tpu.slam.loop_closure import load_dbow_text_vocabulary

    bad = tmp_path / "bad.txt"
    bad.write_text("this is not a vocabulary\n1 2 3\n")
    with pytest.raises(ValueError):
        load_dbow_text_vocabulary(str(bad))


def test_bow_retriever_with_pretrained_vocabulary(tmp_path, rng):
    """A vocabulary-backed retriever is trained from frame 0 (no cold-start
    schedule), quantizes through the tree, and still ranks an exact revisit
    first on ORB descriptors."""
    cv2 = pytest.importorskip("cv2")
    from voldor_tpu.slam.loop_closure import load_dbow_text_vocabulary

    # realistic tiny vocab: k-majority words from ORB descriptors of the
    # harness places, arranged as a depth-1 tree (k = n_words)
    orb = cv2.ORB_create()
    pool = []
    for s in range(6):
        img = _textured_place(rng, s)
        _, des = orb.detectAndCompute(img, None)
        if des is not None:
            pool.append(des)
    pool = np.concatenate(pool)[:800]
    n_words = 32
    sel = np.random.default_rng(0).choice(len(pool), n_words, replace=False)
    lines = ["32 1 0 0"]
    for d in pool[sel]:
        lines.append("0 1 " + " ".join(str(b) for b in d) + " 1.0")
    path = tmp_path / "voc.txt"
    path.write_text("\n".join(lines) + "\n")

    voc = load_dbow_text_vocabulary(str(path))
    r = BowRetriever(vocabulary=voc)
    assert r.trained and r.n_words == n_words
    places = [_textured_place(rng, s) for s in range(4)]
    for img in places:
        _, des = orb.detectAndCompute(img, None)
        r.add_frame(img, des)
    _, qdes = orb.detectAndCompute(places[2], None)
    res = r.query_frame(places[2], qdes)
    assert res and res[0][0] == 2 and res[0][1] > 0.9


def test_sparse_inverted_index_matches_dense_scores(tmp_path, rng):
    """The pretrained-vocabulary path scores through sparse postings + an
    inverted index (never materializing (n_frames, n_words) dense arrays);
    its scores must equal the brute-force dense idf-weighted cosine on the
    same histograms — checked on the tiny vocab with NON-uniform weights."""
    from voldor_tpu.slam.loop_closure import load_dbow_text_vocabulary

    path = tmp_path / "tinyvoc.txt"
    words = _write_tiny_vocab(path)
    voc = load_dbow_text_vocabulary(str(path))
    r = BowRetriever(vocabulary=voc)

    # frames as random descriptor bags biased to different words
    frames = []
    for s in range(5):
        frng = np.random.default_rng(s)
        base = words[frng.integers(4, size=12)]
        noise = frng.integers(0, 2, size=base.shape).astype(np.uint8)
        frames.append(base ^ noise)
    for des in frames:
        r.add_frame(None, des)

    q = frames[3]
    got = dict(r.query_frame(None, q, max_results=5))

    # brute force: dense histograms, idf = word_weights, cosine
    idf = voc.word_weights.astype(np.float64)

    def dense_hist(des):
        a = voc.quantize(des)
        h = np.bincount(a, minlength=4).astype(np.float64)
        return h / np.linalg.norm(h)

    db = np.stack([dense_hist(d) for d in frames]) * idf
    qv = dense_hist(q) * idf
    want = db @ qv / (np.linalg.norm(qv) * np.linalg.norm(db, axis=1))
    for i in range(5):
        assert got[i] == pytest.approx(want[i], rel=1e-5)


def test_real_scale_vocabulary_loads_and_sets_threshold():
    """The committed real-scale vocabulary (tools/build_vocab.py: k=10,
    L=4, ~10^4 words from 108k real ORB descriptors) loads through
    enable_loop_closure, which must switch the score threshold to the
    pretrained operating point — docs/LC_PR.json bow_pretrained shows the
    0.55 online-vocab threshold collapses recall to 0.17/0.10 on this
    score scale (reference artifact role: voldor_slam.py:340-359)."""
    pytest.importorskip("cv2")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "data", "vocab_k10L4.txt.gz")
    if not os.path.exists(path):
        pytest.skip("vocabulary artifact not present")

    from voldor_tpu.slam.system import VOLDOR_SLAM

    s = VOLDOR_SLAM(mode="mono")
    s.enable_loop_closure(voc_path=path)
    voc = s.retriever._voc
    assert voc is not None and voc.k == 10 and voc.n_words >= 5000
    assert s.lc_bow_score_thresh == s.lc_bow_score_thresh_pretrained == 0.35
    # real-scale quantization stays sane: random descriptors spread over
    # many distinct words (a degenerate tree would funnel them into few)
    rng = np.random.default_rng(3)
    des = rng.integers(0, 256, size=(512, 32), dtype=np.uint8)
    ids = voc.quantize(des)
    assert ids.min() >= 0 and ids.max() < voc.n_words
    assert len(np.unique(ids)) > 100
