"""BoW inverted-index keyframe database (reference src/KeyFrameDatabase.cc).

Word id -> keyframe-id list inverted file; loop candidates use shared-word
counting, the 0.8 x max-common-words filter, a minimum-score filter, and
covisibility-group accumulated scoring with 0.75 x best-group retention
(DetectLoopCandidates, :79-198); relocalization candidates are the analogous
query without the min-score / connected-exclusion (:206-309).

The inverted file and its query prefilters run in the native C++ engine
(native/invindex.cpp — the DBoW2-inverted-file equivalent); a pure-Python
backend provides the same surface when the toolchain is unavailable. The
covisibility-group accumulation stage stays here: it reads the live
covisibility graph.
"""

from __future__ import annotations

import numpy as np

from orbslam2commentedbyxcm_tpu.ops import bow


class _PyBackend:
    """Pure-Python inverted file with the same query semantics as
    native/invindex.cpp."""

    def __init__(self):
        self.inverted: dict[int, list[int]] = {}
        self.vectors: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def add(self, kf_id, word_ids, values):
        self.vectors[kf_id] = (np.asarray(word_ids), np.asarray(values))
        for w in word_ids:
            self.inverted.setdefault(int(w), []).append(kf_id)

    def erase(self, kf_id):
        vec = self.vectors.pop(kf_id, None)
        if vec is None:
            return
        for w in vec[0]:
            lst = self.inverted.get(int(w))
            if lst is not None and kf_id in lst:
                lst.remove(kf_id)

    def clear(self):
        self.inverted.clear()
        self.vectors.clear()

    def __len__(self):
        return len(self.vectors)

    def score(self, kf1, kf2):
        a, b = self.vectors.get(kf1), self.vectors.get(kf2)
        if a is None or b is None:
            return 0.0
        return bow.l1_score(a[0], a[1], b[0], b[1])

    def score_vec(self, word_ids, values, kf_id):
        b = self.vectors.get(kf_id)
        if b is None:
            return 0.0
        return bow.l1_score(word_ids, values, b[0], b[1])

    def query(self, word_ids, values, exclude, min_score):
        counts: dict[int, int] = {}
        for w in word_ids:
            for kf_id in self.inverted.get(int(w), ()):
                if kf_id not in exclude:
                    counts[kf_id] = counts.get(kf_id, 0) + 1
        if not counts:
            return [], []
        min_common = 0.8 * max(counts.values())
        kfs, scores = [], []
        for kf_id, c in counts.items():
            if c <= min_common:
                continue
            vec = self.vectors.get(kf_id)
            if vec is None:
                continue
            s = bow.l1_score(word_ids, values, vec[0], vec[1])
            if s >= min_score:
                kfs.append(kf_id)
                scores.append(s)
        return kfs, scores


class KeyFrameDatabase:
    def __init__(self, vocabulary: bow.Vocabulary, use_native: bool | None = None):
        self.voc = vocabulary
        backend = None
        if use_native is not False:
            try:
                from orbslam2commentedbyxcm_tpu import native

                backend = native.InvertedIndex()
            except RuntimeError:
                if use_native:
                    raise
        self._b = backend if backend is not None else _PyBackend()

    @property
    def is_native(self) -> bool:
        return not isinstance(self._b, _PyBackend)

    def add(self, kf_id: int, word_ids: np.ndarray, values: np.ndarray):
        self._b.add(kf_id, word_ids, values)

    def erase(self, kf_id: int):
        self._b.erase(kf_id)

    def clear(self):
        self._b.clear()

    def __len__(self):
        return len(self._b)

    def score(self, kf1: int, kf2: int) -> float:
        return float(self._b.score(kf1, kf2))

    def score_vec(self, vec, kf_id: int) -> float:
        """Score an un-registered BoW vector against a stored keyframe."""
        if vec is None:
            return 0.0
        return float(self._b.score_vec(vec[0], vec[1], kf_id))

    # -- queries -----------------------------------------------------------

    @staticmethod
    def _group_accumulate(scored, world_map) -> list[int]:
        """Covisibility-group accumulated scoring with 0.75 x best retention
        (reference src/KeyFrameDatabase.cc:139-198)."""
        by_id = dict(scored)
        group_scores = []
        for kf_id, s in scored:
            kf = world_map.keyframes.get(kf_id)
            if kf is None or kf.bad:
                continue
            acc, best_id, best_s = s, kf_id, s
            for nb in kf.best_covisible(10):
                pair = by_id.get(nb)
                if pair is not None:
                    acc += pair
                    if pair > best_s:
                        best_s, best_id = pair, nb
            group_scores.append((acc, best_id))
        if not group_scores:
            return []
        th = 0.75 * max(g[0] for g in group_scores)
        out, seen = [], set()
        # best-group-first ordering: LoopClosing caps Sim3 attempts per
        # keyframe, so the most likely candidate must be tried first
        for acc, kf_id in sorted(group_scores, key=lambda g: -g[0]):
            if acc > th and kf_id not in seen:
                seen.add(kf_id)
                out.append(kf_id)
        return out

    def detect_loop_candidates(
        self, query_kf_id: int, word_ids, values, min_score: float,
        connected: set[int], world_map,
    ) -> list[int]:
        """Candidates for loop closure against the query keyframe, excluding
        its covisible set (reference DetectLoopCandidates)."""
        exclude = set(connected) | {query_kf_id}
        kfs, scores = self._b.query(word_ids, values, exclude, min_score)
        scored = [
            (kf_id, s) for kf_id, s in zip(kfs, scores)
            if (kf := world_map.keyframes.get(kf_id)) is not None and not kf.bad
        ]
        if not scored:
            return []
        return self._group_accumulate(scored, world_map)

    def detect_relocalization_candidates(self, word_ids, values, world_map) -> list[int]:
        kfs, scores = self._b.query(word_ids, values, set(), -np.inf)
        scored = [
            (kf_id, s) for kf_id, s in zip(kfs, scores)
            if (kf := world_map.keyframes.get(kf_id)) is not None and not kf.bad
        ]
        if not scored:
            return []
        return self._group_accumulate(scored, world_map)
