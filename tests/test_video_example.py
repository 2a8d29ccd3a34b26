"""examples/run_video.py (== the fork's myvideo/myslam targets,
reference CMakeLists.txt:117-123): video-file monocular SLAM end-to-end."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # system-level: excluded from -m quick

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SETTINGS = """%YAML:1.0
Camera.fx: 250.0
Camera.fy: 250.0
Camera.cx: 160.0
Camera.cy: 120.0
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 320
Camera.height: 240
Camera.fps: 30.0
Camera.bf: 20.0
Camera.RGB: 1
ThDepth: 40.0
ORBextractor.nFeatures: 400
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 4
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def test_run_video_tracks_and_saves_trajectory(tmp_path):
    from orbslam2commentedbyxcm_tpu.utils.camera import Camera
    from orbslam2commentedbyxcm_tpu.utils.synth import SyntheticSequence

    cam = Camera(fx=250.0, fy=250.0, cx=160.0, cy=120.0, width=320, height=240, bf=20.0)
    seq = SyntheticSequence(camera=cam, n_frames=14, trajectory="sideways")
    video = str(tmp_path / "seq.avi")
    wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (320, 240), isColor=False)
    if not wr.isOpened():
        pytest.skip("cv2 VideoWriter unavailable (no MJPG codec)")
    for i in range(seq.n_frames):
        wr.write(seq.render(i).astype(np.uint8))
    wr.release()
    settings = tmp_path / "settings.yaml"
    settings.write_text(SETTINGS)

    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "run_video.py"),
         video, str(settings), "--no-loop-closing",
         "--out-prefix", str(tmp_path) + os.sep],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    traj = np.loadtxt(tmp_path / "CameraTrajectory.txt")
    # mono init takes a few frames; require most of the sequence tracked
    assert traj.shape[0] >= 6 and traj.shape[1] == 8
    kf = np.loadtxt(tmp_path / "KeyFrameTrajectory.txt")
    assert kf.size >= 8
