"""Per-candidate Sim3 cooldown (models/loop_closing.py).

A geometric-rejected loop candidate is skipped for the next
`sim3_cooldown_kfs` keyframes and retried afterwards — the memo that keeps
the 72k-word vocabulary's recurring appearance-similar candidates from
costing a Sim3 RANSAC attempt on every keyframe (the reference's 1M-word
ORBvoc keeps candidate sets small instead).
"""

from orbslam2commentedbyxcm_tpu.models.loop_closing import LoopClosing
from orbslam2commentedbyxcm_tpu.models.map import Map


class _KF:
    """Minimal query-keyframe stand-in: the cooldown gate reads kf_id only."""

    def __init__(self, kf_id):
        self.kf_id = kf_id


def test_sim3_cooldown_skips_then_retries():
    lc = LoopClosing(Map(), camera=None)
    # candidate 2 was geometric-rejected at kf 4
    lc._sim3_cooldown[2] = 4 + lc.sim3_cooldown_kfs

    # within the cooldown window: skipped without a Sim3 attempt
    found = lc._compute_sim3_geom(lc.map, _KF(5), {}, [2])
    assert found is None
    assert lc.stats["cooldown_skip"] == 1
    assert lc.stats["sim3_tried"] == 0

    # after the window: attempted again (missing candidate view -> no-op,
    # but the attempt counter proves the gate reopened)
    found = lc._compute_sim3_geom(lc.map, _KF(4 + lc.sim3_cooldown_kfs), {}, [2])
    assert found is None
    assert lc.stats["cooldown_skip"] == 1
    assert lc.stats["sim3_tried"] == 1


def test_sim3_cooldown_is_per_candidate():
    lc = LoopClosing(Map(), camera=None)
    lc._sim3_cooldown[7] = 10
    lc._compute_sim3_geom(lc.map, _KF(6), {}, [7, 8])
    # candidate 7 cooled down; candidate 8 still attempted
    assert lc.stats["cooldown_skip"] == 1
    assert lc.stats["sim3_tried"] == 1
