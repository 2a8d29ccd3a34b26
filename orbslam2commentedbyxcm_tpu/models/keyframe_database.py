"""BoW inverted-index keyframe database (reference src/KeyFrameDatabase.cc).

Word id -> keyframe-id list inverted file; loop candidates use shared-word
counting, the 0.8 x max-common-words filter, a minimum-score filter, and
covisibility-group accumulated scoring with 0.75 x best-group retention
(DetectLoopCandidates, :79-198); relocalization candidates are the analogous
query without the min-score / connected-exclusion (:206-309).
"""

from __future__ import annotations

import numpy as np

from orbslam2commentedbyxcm_tpu.ops import bow


class KeyFrameDatabase:
    def __init__(self, vocabulary: bow.Vocabulary):
        self.voc = vocabulary
        self.inverted: dict[int, list[int]] = {}
        self.kf_vectors: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def add(self, kf_id: int, word_ids: np.ndarray, values: np.ndarray):
        self.kf_vectors[kf_id] = (word_ids, values)
        for w in word_ids:
            self.inverted.setdefault(int(w), []).append(kf_id)

    def erase(self, kf_id: int):
        vec = self.kf_vectors.pop(kf_id, None)
        if vec is None:
            return
        for w in vec[0]:
            lst = self.inverted.get(int(w))
            if lst is not None and kf_id in lst:
                lst.remove(kf_id)

    def clear(self):
        self.inverted.clear()
        self.kf_vectors.clear()

    def score(self, kf1: int, kf2: int) -> float:
        if kf1 not in self.kf_vectors or kf2 not in self.kf_vectors:
            return 0.0
        a, b = self.kf_vectors[kf1], self.kf_vectors[kf2]
        return bow.l1_score(a[0], a[1], b[0], b[1])

    def score_vec(self, vec, kf_id: int) -> float:
        """Score an un-registered BoW vector against a stored keyframe."""
        b = self.kf_vectors.get(kf_id)
        if b is None or vec is None:
            return 0.0
        return bow.l1_score(vec[0], vec[1], b[0], b[1])

    # -- queries -----------------------------------------------------------

    def _shared_word_counts(self, word_ids: np.ndarray, exclude: set[int]) -> dict[int, int]:
        counts: dict[int, int] = {}
        for w in word_ids:
            for kf_id in self.inverted.get(int(w), ()):
                if kf_id not in exclude:
                    counts[kf_id] = counts.get(kf_id, 0) + 1
        return counts

    def detect_loop_candidates(
        self, query_kf_id: int, word_ids, values, min_score: float,
        connected: set[int], world_map,
    ) -> list[int]:
        """Candidates for loop closure against the query keyframe, excluding
        its covisible set (reference DetectLoopCandidates)."""
        exclude = set(connected) | {query_kf_id}
        counts = self._shared_word_counts(word_ids, exclude)
        if not counts:
            return []
        max_common = max(counts.values())
        min_common = 0.8 * max_common
        scored = []
        for kf_id, c in counts.items():
            if c <= min_common:
                continue
            kf = world_map.keyframes.get(kf_id)
            if kf is None or kf.bad:
                continue
            vec = self.kf_vectors.get(kf_id)
            if vec is None:
                continue
            s = bow.l1_score(word_ids, values, vec[0], vec[1])
            if s >= min_score:
                scored.append((kf_id, s))
        if not scored:
            return []

        # covisibility-group accumulated scoring
        group_scores = []
        for kf_id, s in scored:
            kf = world_map.keyframes.get(kf_id)
            acc, best_id, best_s = s, kf_id, s
            for nb in kf.best_covisible(10):
                pair = dict(scored).get(nb)
                if pair is not None:
                    acc += pair
                    if pair > best_s:
                        best_s, best_id = pair, nb
            group_scores.append((acc, best_id))
        best_acc = max(g[0] for g in group_scores)
        th = 0.75 * best_acc
        out, seen = [], set()
        for acc, kf_id in group_scores:
            if acc > th and kf_id not in seen:
                seen.add(kf_id)
                out.append(kf_id)
        return out

    def detect_relocalization_candidates(self, word_ids, values, world_map) -> list[int]:
        counts = self._shared_word_counts(word_ids, set())
        if not counts:
            return []
        max_common = max(counts.values())
        min_common = 0.8 * max_common
        scored = [
            (kf_id, bow.l1_score(word_ids, values, *self.kf_vectors[kf_id]))
            for kf_id, c in counts.items()
            if c > min_common and kf_id in self.kf_vectors
        ]
        if not scored:
            return []
        group_scores = []
        for kf_id, s in scored:
            kf = world_map.keyframes.get(kf_id)
            if kf is None or kf.bad:
                continue
            acc, best_id, best_s = s, kf_id, s
            for nb in kf.best_covisible(10):
                pair = dict(scored).get(nb)
                if pair is not None:
                    acc += pair
                    if pair > best_s:
                        best_s, best_id = pair, nb
            group_scores.append((acc, best_id))
        if not group_scores:
            return []
        best_acc = max(g[0] for g in group_scores)
        th = 0.75 * best_acc
        out, seen = [], set()
        for acc, kf_id in group_scores:
            if acc > th and kf_id not in seen:
                seen.add(kf_id)
                out.append(kf_id)
        return out
