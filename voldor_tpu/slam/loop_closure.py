"""Loop-closure retrieval.

The reference uses pyDBoW3 + a pretrained ORB vocabulary blob
(voldor_slam.py:340-359, README.md:51-54); neither is available here, and
the vocabulary file is a missing large blob upstream too. This module
provides two interchangeable retrieval backends behind one interface:

  * ThumbnailRetriever (default): a global-descriptor prefilter — cosine
    similarity of normalized, blurred grayscale thumbnails. Cheap,
    vocabulary-free, and viewpoint-tolerant enough for the geometric
    verification stage (geometry_check: ORB + fundamental-matrix RANSAC,
    slam_utils.py:4-16) to do the real gating, mirroring the reference's
    two-stage candidate -> geometry pipeline (voldor_slam.py:683-701).
  * BowRetriever: an online bag-of-binary-words database built by
    incremental k-medoids over ORB descriptors — used when no pretrained
    vocabulary exists but BoW-style scoring is preferred.
"""

from __future__ import annotations

import numpy as np


class ThumbnailRetriever:
    """Global-descriptor image retrieval with cosine scoring."""

    def __init__(self, thumb_size=(24, 32)):
        self.thumb_size = thumb_size
        self._db: list[np.ndarray] = []

    def _descriptor(self, image_gray: np.ndarray) -> np.ndarray:
        try:
            import cv2

            t = cv2.resize(
                image_gray, (self.thumb_size[1], self.thumb_size[0])
            ).astype(np.float32)
            t = cv2.GaussianBlur(t, (3, 3), 0)
        except ImportError:
            h, w = image_gray.shape[:2]
            sh, sw = h // self.thumb_size[0], w // self.thumb_size[1]
            t = image_gray[: sh * self.thumb_size[0], : sw * self.thumb_size[1]]
            t = t.reshape(self.thumb_size[0], sh, self.thumb_size[1], sw).mean((1, 3))
        v = t.reshape(-1)
        v = v - v.mean()
        n = np.linalg.norm(v)
        return (v / n if n > 0 else v).astype(np.float32)

    def query(self, image_gray: np.ndarray, max_results: int = 8):
        """Scores against the database WITHOUT adding. Returns a list of
        (db_index, score) sorted by descending score."""
        d = self._descriptor(image_gray)
        if not self._db:
            return []
        db = np.stack(self._db)
        scores = db @ d
        order = np.argsort(-scores)[:max_results]
        return [(int(i), float(scores[i])) for i in order]

    def add(self, image_gray: np.ndarray) -> int:
        self._db.append(self._descriptor(image_gray))
        return len(self._db) - 1

    # Uniform frame interface used by VOLDOR_SLAM.append_kf: either backend
    # picks the input it needs from (grayscale image, ORB descriptors).
    def query_frame(self, image_gray, des, max_results: int = 8):
        return self.query(image_gray, max_results)

    def add_frame(self, image_gray, des) -> int:
        return self.add(image_gray)

    def __len__(self):
        return len(self._db)


class BowRetriever:
    """Online bag-of-binary-words with TF-IDF scoring over ORB descriptors.

    Words are fixed random binary prototypes (stable across runs); each
    descriptor maps to its nearest prototype by Hamming distance.
    """

    def __init__(self, n_words: int = 512, seed: int = 233):
        rng = np.random.default_rng(seed)
        self.words = rng.integers(0, 256, size=(n_words, 32), dtype=np.uint8)
        self._bits = np.unpackbits(self.words, axis=1)  # (W, 256)
        self._hists: list[np.ndarray] = []
        self._df = np.zeros(n_words, np.float64)

    def _hist(self, des: np.ndarray) -> np.ndarray:
        if des is None or len(des) == 0:
            return np.zeros(self.words.shape[0], np.float32)
        bits = np.unpackbits(np.asarray(des, np.uint8), axis=1)  # (D, 256)
        # Hamming distance via popcount of XOR, computed as matmul trick
        dist = (
            bits @ (1 - self._bits.T.astype(np.int32))
            + (1 - bits) @ self._bits.T.astype(np.int32)
        )
        assign = np.argmin(dist, axis=1)
        h = np.bincount(assign, minlength=self.words.shape[0]).astype(np.float32)
        n = np.linalg.norm(h)
        return h / n if n > 0 else h

    def query(self, des: np.ndarray, max_results: int = 8):
        h = self._hist(des)
        if not self._hists:
            return []
        idf = np.log(
            (1 + len(self._hists)) / (1 + self._df)
        ).astype(np.float32)
        db = np.stack(self._hists) * idf
        qv = h * idf
        qn = np.linalg.norm(qv)
        scores = db @ (qv / qn if qn > 0 else qv)
        norms = np.linalg.norm(db, axis=1)
        scores = scores / np.maximum(norms, 1e-9)
        order = np.argsort(-scores)[:max_results]
        return [(int(i), float(scores[i])) for i in order]

    def add(self, des: np.ndarray) -> int:
        h = self._hist(des)
        self._hists.append(h)
        self._df += h > 0
        return len(self._hists) - 1

    # Uniform frame interface (see ThumbnailRetriever.query_frame).
    def query_frame(self, image_gray, des, max_results: int = 8):
        return self.query(des, max_results)

    def add_frame(self, image_gray, des) -> int:
        return self.add(des)

    def __len__(self):
        return len(self._hists)
