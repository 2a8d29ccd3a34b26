"""Viewer / FrameDrawer / MapDrawer smoke tests (reference src/Viewer.cc,
src/FrameDrawer.cc, src/MapDrawer.cc equivalents, headless renders)."""

import os

import pytest

from orbslam2commentedbyxcm_tpu.models.system import System, Sensor
from orbslam2commentedbyxcm_tpu.models.tracking import TrackingConfig
from orbslam2commentedbyxcm_tpu.utils.camera import Camera
from orbslam2commentedbyxcm_tpu.utils.synth import SyntheticSequence
from orbslam2commentedbyxcm_tpu.utils.viewer import Viewer


@pytest.fixture(scope="module", autouse=True)
def _fresh_compiler_state():
    import jax

    jax.clear_caches()
    from orbslam2commentedbyxcm_tpu.ops.orb import ORBExtractor

    ORBExtractor._jit_cache.clear()
    yield


def test_viewer_emits_renders(tmp_path):
    cam = Camera(fx=250.0, fy=250.0, cx=160.0, cy=120.0, width=320, height=240,
                 bf=25.0, th_depth=40.0)
    seq = SyntheticSequence(camera=cam, n_frames=4, trajectory="sideways")
    system = System(cam, Sensor.RGBD, config=TrackingConfig(n_features=300),
                    enable_loop_closing=False)
    viewer = Viewer(system, str(tmp_path), every=2)
    for i in range(4):
        img = seq.render(i)
        system.track_rgbd(img, seq.depth_map(i), i / 30.0)
        viewer.update(system.tracking.last_frame, image=img)

    pngs = sorted(os.listdir(tmp_path))
    assert any(p.startswith("map_") for p in pngs), pngs
    assert any(p.startswith("frame_") for p in pngs), pngs
    info = viewer.frame_drawer.text_info()
    assert "KFs:" in info and "MPs:" in info


def test_threaded_viewer_renders_off_thread(tmp_path):
    """Reference Viewer thread parity (src/System.cc:121): rendering runs on
    its own worker; update() never blocks, shutdown() drains."""
    cam = Camera(fx=250.0, fy=250.0, cx=160.0, cy=120.0, width=320, height=240,
                 bf=25.0, th_depth=40.0)
    seq = SyntheticSequence(camera=cam, n_frames=4, trajectory="sideways")
    system = System(cam, Sensor.RGBD, config=TrackingConfig(n_features=300),
                    enable_loop_closing=False)
    viewer = Viewer(system, str(tmp_path), every=2, threaded=True)
    assert viewer._thread.is_alive()
    for i in range(4):
        img = seq.render(i)
        system.track_rgbd(img, seq.depth_map(i), i / 30.0)
        viewer.update(system.tracking.last_frame, image=img)
    viewer.shutdown()
    assert not viewer._thread.is_alive()
    pngs = sorted(os.listdir(tmp_path))
    assert any(p.startswith("map_") for p in pngs), pngs
