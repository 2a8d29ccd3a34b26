"""Tracing/observability subsystem (SURVEY.md §5: reference has only cout
prints) and the prefetching dataset loader."""

import json

import numpy as np
import pytest

from orbslam2commentedbyxcm_tpu.models.system import Sensor, System
from orbslam2commentedbyxcm_tpu.models.tracking import TrackingConfig
from orbslam2commentedbyxcm_tpu.utils.camera import Camera
from orbslam2commentedbyxcm_tpu.utils.synth import SyntheticSequence
from orbslam2commentedbyxcm_tpu.utils.tracing import Tracer


@pytest.mark.slow  # full-System run: system tier
def test_tracer_records_frames_and_spans(tmp_path):
    cam = Camera(fx=250.0, fy=250.0, cx=160.0, cy=120.0, width=320, height=240, bf=20.0)
    seq = SyntheticSequence(camera=cam, n_frames=30, trajectory="sideways")
    cfg = TrackingConfig(n_features=600, max_frames_between_kf=8, kf_tracked_ratio=0.95)
    tracer = Tracer()
    system = System(cam, Sensor.MONOCULAR, config=cfg, enable_loop_closing=False,
                    tracer=tracer)
    for i in range(seq.n_frames):
        system.track_monocular(seq.render(i), i / 30.0)
    system.shutdown()

    st = tracer.stats()
    assert st["spans"]["extract"]["n"] == seq.n_frames
    assert st["spans"]["tracking"]["n"] == seq.n_frames
    assert st["spans"]["extract"]["mean_ms"] > 0
    # keyframes were inserted -> mapping spans exist
    assert "local_mapping" in st["spans"]

    table = tracer.summary_table()
    assert "extract" in table and "tracking" in table

    out = tmp_path / "trace.jsonl"
    tracer.dump_jsonl(str(out))
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    frames = [l for l in lines if "frame" in l]
    assert len(frames) == seq.n_frames
    assert all("spans" in f and "state" in f for f in frames)
    assert "summary" in lines[-1]


def test_disabled_tracer_is_inert():
    t = Tracer(enabled=False)
    t.begin_frame(0)
    with t.span("x"):
        pass
    t.count("y")
    t.end_frame()
    st = t.stats()
    assert st["spans"] == {} and st["counters"] == {}


def test_prefetcher_yields_in_order_and_len():
    from orbslam2commentedbyxcm_tpu.utils.datasets import Prefetcher

    class Fake:
        def __len__(self):
            return 25

        def __getitem__(self, i):
            return (float(i), np.full((4, 4), i, np.float32), None)

    got = [ts for ts, img, aux in Prefetcher(Fake(), depth=3)]
    assert got == [float(i) for i in range(25)]
    p = Prefetcher(Fake(), depth=2, start=5, stop=11)
    assert len(p) == 6
    assert [ts for ts, *_ in p] == [5.0, 6.0, 7.0, 8.0, 9.0, 10.0]


def test_prefetcher_propagates_errors():
    from orbslam2commentedbyxcm_tpu.utils.datasets import Prefetcher

    class Boom:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise FileNotFoundError("missing.png")
            return (float(i), None, None)

    it = iter(Prefetcher(Boom(), depth=2))
    assert next(it)[0] == 0.0
    assert next(it)[0] == 1.0
    try:
        next(it)
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError:
        pass
