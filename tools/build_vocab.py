"""Build a real-scale DBoW-format ORB vocabulary (VERDICT r4 item 6).

The reference ships a pretrained ORBvoc (k=10, L=5, ~1M words) loaded
through pyDBoW3 (voldor_slam.py:340-359). No pretrained artifact exists
in this sandbox (zero egress; the common ORBvoc.bin is additionally
QuickLZ-compressed, an empirically-unverifiable format here), so this
tool BUILDS one at realistic branching (k=10, L=4 -> up to 10^4 words)
from >=100k real ORB descriptors harvested from real photographs
(sklearn's sample JPEGs under crops/warps + rendered street-canyon
views), using hierarchical k-majority — the same construction DBoW
vocabularies use — and writes it in the DBoW2/ORB-SLAM TEXT format that
`load_dbow_text_vocabulary` (and ORB-SLAM itself) consumes. Word weights
are TF-IDF idf over the training frames, like DBoW's TF_IDF weighting.

Output: data/vocab_k10L4.txt.gz + a summary JSON line.
Run: python tools/build_vocab.py [--out data/vocab_k10L4.txt.gz]
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from voldor_tpu.slam.loop_closure import _hamming_dist, _kmajority  # noqa: E402


def harvest_descriptors(n_target=120_000, seed=5):
    """ORB descriptors from real-photo crops/warps + rendered views.
    Returns (all_des (N, 32) uint8, per_frame list of des arrays)."""
    import cv2
    from sklearn.datasets import load_sample_image

    rng = np.random.default_rng(seed)
    orb = cv2.ORB_create(nfeatures=700)
    photos = [load_sample_image("china.jpg").mean(-1).astype(np.uint8),
              load_sample_image("flower.jpg").mean(-1).astype(np.uint8)]
    frames = []
    i = 0
    while sum(len(d) for d in frames) < n_target * 3 // 4:
        p = photos[i % 2]
        i += 1
        h, w = p.shape
        ch = int(rng.integers(160, min(360, h)))
        cw = int(rng.integers(220, min(480, w)))
        y = int(rng.integers(0, h - ch))
        x = int(rng.integers(0, w - cw))
        crop = np.ascontiguousarray(p[y:y + ch, x:x + cw])
        ang = float(rng.uniform(-25, 25))
        sc = float(rng.uniform(0.7, 1.4))
        M = cv2.getRotationMatrix2D((cw / 2, ch / 2), ang, sc)
        crop = cv2.warpAffine(crop, M, (cw, ch),
                              borderMode=cv2.BORDER_REFLECT)
        _, des = orb.detectAndCompute(crop, None)
        if des is not None and len(des) >= 30:
            frames.append(des.astype(np.uint8))

    # rendered street-canyon views (the deployment appearance domain)
    import real_scene as RS
    K = np.array([[RS.FX, 0, RS.CX], [0, RS.FY, RS.CY], [0, 0, 1]])
    planes, textures = RS._planes(), RS._textures()
    cams = RS.trajectory(60, seed=31)
    rrng = np.random.default_rng(seed + 1)
    for T in cams[::2]:
        img, _ = RS.render_view(K, T[:3, :3], T[:3, 3], planes, textures,
                                RS.H, RS.W, rng=rrng)
        gray = img.mean(-1).astype(np.uint8)
        _, des = orb.detectAndCompute(gray, None)
        if des is not None and len(des) >= 30:
            frames.append(des.astype(np.uint8))
        if sum(len(d) for d in frames) >= n_target:
            break
    all_des = np.concatenate(frames, axis=0)
    return all_des, frames


def build_hkmajority(des, k, L, rng, min_cluster=8):
    """Hierarchical k-majority tree. Returns file-order body rows
    (parent_id, is_leaf, descriptor(32,), ) — parents precede children
    (DFS emission), ids implicit 1..n under root 0 — matching
    load_dbow_text_vocabulary's expectations."""
    rows = []  # (parent, is_leaf, des32)

    def rec(subset, parent, depth):
        n = subset.shape[0]
        kk = min(k, n)
        if kk == 0:
            return
        init = subset[rng.choice(n, size=kk, replace=False)]
        words = _kmajority(subset, kk, init, rng)
        assign = np.argmin(_hamming_dist(subset, words), axis=1)
        for c in range(kk):
            members = subset[assign == c]
            if members.shape[0] == 0:
                continue
            make_leaf = (depth + 1 >= L
                         or members.shape[0] < max(min_cluster, k))
            rows.append([parent, 1 if make_leaf else 0, words[c]])
            nid = len(rows)  # implicit id of the row just appended
            if not make_leaf:
                rec(members, nid, depth + 1)

    rec(des, 0, 0)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--descriptors", type=int, default=120_000)
    ap.add_argument("--out", default=os.path.join(_REPO, "data",
                                                  "vocab_k10L4.txt.gz"))
    args = ap.parse_args()

    t0 = time.time()
    des, frames = harvest_descriptors(args.descriptors)
    print(f"# harvested {des.shape[0]} ORB descriptors from "
          f"{len(frames)} frames in {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(97)
    t0 = time.time()
    rows = build_hkmajority(des, args.k, args.L, rng)
    n_leaves = sum(r[1] for r in rows)
    print(f"# built tree: {len(rows)} nodes, {n_leaves} words in "
          f"{time.time()-t0:.0f}s", flush=True)

    # idf weights over the training frames (DBoW TF_IDF): quantize each
    # frame through the tree, weight = ln(N / n_frames_containing_word)
    from voldor_tpu.slam.loop_closure import _build_tree

    parents = np.asarray([r[0] for r in rows], np.int64)
    is_leaf = np.asarray([r[1] for r in rows], bool)
    descs = np.stack([r[2] for r in rows])
    voc0 = _build_tree(args.k, args.L, parents, is_leaf, descs,
                       np.ones(len(rows)))
    df = np.zeros(voc0.n_words, np.int64)
    for d in frames:
        wids = np.unique(voc0.quantize(d))
        df[wids] += 1
    N = len(frames)
    idf = np.where(df > 0, np.log(N / np.maximum(df, 1)), 0.0)

    # leaf weights back into file order
    weights = np.zeros(len(rows))
    leaf_rows = np.flatnonzero(is_leaf)
    weights[leaf_rows] = idf

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with gzip.open(args.out, "wt") as f:
        f.write(f"{args.k} {args.L} 0 0\n")  # scoring=L1(0), weighting=TF_IDF(0)
        for i, (parent, leaf, d) in enumerate(rows):
            f.write(f"{parent} {leaf} "
                    + " ".join(str(int(b)) for b in d)
                    + f" {weights[i]:.6f}\n")

    summary = {
        "k": args.k, "L": args.L, "n_nodes": len(rows),
        "n_words": int(n_leaves), "n_train_descriptors": int(des.shape[0]),
        "n_train_frames": len(frames),
        "idf_weight_range": [round(float(idf[df > 0].min()), 3)
                             if (df > 0).any() else 0.0,
                             round(float(idf.max()), 3)],
        "words_with_zero_df": int((df == 0).sum()),
        "out": os.path.relpath(args.out, _REPO),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
