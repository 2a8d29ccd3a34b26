"""System facade: the public entry point (reference include/System.h).

Wires extractor -> Tracking -> LocalMapping (-> LoopClosing), routes frames per
sensor type, exposes mode switching, reset, and the three trajectory-save
formats (reference src/System.cc:347-503).
"""

from __future__ import annotations

import enum

import numpy as np

from orbslam2commentedbyxcm_tpu.models.frame import Frame
from orbslam2commentedbyxcm_tpu.models.local_mapping import LocalMapping
from orbslam2commentedbyxcm_tpu.models.map import Map
from orbslam2commentedbyxcm_tpu.models.tracking import Tracking, TrackingConfig, TrackingState
from orbslam2commentedbyxcm_tpu.ops.orb import ORBExtractor
from orbslam2commentedbyxcm_tpu.utils.camera import Camera
from orbslam2commentedbyxcm_tpu.utils.geometry import rot_to_quat
import jax.numpy as jnp


class Sensor(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2


class System:
    def __init__(
        self,
        camera: Camera,
        sensor: Sensor = Sensor.MONOCULAR,
        config: TrackingConfig | None = None,
        vocabulary=None,
        enable_loop_closing: bool = True,
    ):
        self.camera = camera
        self.sensor = sensor
        self.cfg = config or TrackingConfig()
        self.map = Map()
        self.extractor = ORBExtractor(
            n_features=self.cfg.n_features,
            scale_factor=self.cfg.scale_factor,
            n_levels=self.cfg.n_levels,
        )
        self.local_mapping = LocalMapping(self.map, camera)
        self.loop_closing = None
        if enable_loop_closing:
            try:
                from orbslam2commentedbyxcm_tpu.models.loop_closing import LoopClosing

                self.loop_closing = LoopClosing(self.map, camera, vocabulary=vocabulary)
                self.local_mapping.loop_closer = self.loop_closing
            except ImportError:
                pass
        try:
            from orbslam2commentedbyxcm_tpu.models.relocalization import Relocalizer

            self.local_mapping.relocalizer = Relocalizer(self.map, camera, vocabulary=vocabulary)
        except ImportError:
            pass
        self.tracking = Tracking(camera, self.extractor, self.map, self.local_mapping, self.cfg)

    # -- frame entry points ------------------------------------------------

    def _make_frame(self, image, timestamp: float) -> Frame:
        img = np.asarray(image)
        if img.ndim == 3:
            img = img.mean(axis=-1)  # grayscale conversion (reference :301-312)
        feats = self.extractor(img.astype(np.float32))
        frame = Frame(feats, self.camera, timestamp, self.cfg.scale_factor, self.cfg.n_levels)
        if self.camera.has_distortion:
            frame.uv_und = np.asarray(self.camera.undistort_points(jnp.asarray(frame.uv)))
        return frame

    def track_monocular(self, image, timestamp: float):
        """Returns Tcw (4, 4) or None if not tracked (reference TrackMonocular)."""
        assert self.sensor == Sensor.MONOCULAR
        frame = self._make_frame(image, timestamp)
        state = self.tracking.track_frame(frame)
        return frame.t_cw.copy() if state == TrackingState.OK else None

    def track_rgbd(self, image, depth, timestamp: float):
        assert self.sensor == Sensor.RGBD
        frame = self._make_frame(image, timestamp)
        self._attach_depth(frame, np.asarray(depth))
        state = self.tracking.track_frame(frame)
        return frame.t_cw.copy() if state == TrackingState.OK else None

    def track_stereo(self, image_left, image_right, timestamp: float):
        assert self.sensor == Sensor.STEREO
        from orbslam2commentedbyxcm_tpu.ops.stereo import stereo_match_frame

        frame = self._make_frame(image_left, timestamp)
        left = np.asarray(image_left)
        if left.ndim == 3:
            left = left.mean(axis=-1)
        stereo_match_frame(
            frame, left.astype(np.float32), np.asarray(image_right, np.float32),
            self.extractor, self.camera,
        )
        state = self.tracking.track_frame(frame)
        return frame.t_cw.copy() if state == TrackingState.OK else None

    def _attach_depth(self, frame: Frame, depth_map: np.ndarray):
        """RGB-D pseudo-stereo (reference ComputeStereoFromRGBD,
        src/Frame.cc:888-909): sample depth at keypoints, synthesize u_right."""
        u = np.clip(frame.uv[:, 0].astype(int), 0, depth_map.shape[1] - 1)
        v = np.clip(frame.uv[:, 1].astype(int), 0, depth_map.shape[0] - 1)
        d = depth_map[v, u]
        good = np.isfinite(d) & (d > 0) & frame.valid
        frame.depth = np.where(good, d, -1.0).astype(np.float32)
        with np.errstate(divide="ignore", invalid="ignore"):
            ur = frame.uv_und[:, 0] - self.camera.bf / d
        frame.u_right = np.where(good, ur, -1.0).astype(np.float32)

    # -- modes / control ---------------------------------------------------

    def activate_localization_mode(self):
        self.tracking.localization_only = True
        self.local_mapping.paused = True

    def deactivate_localization_mode(self):
        self.tracking.localization_only = False
        self.local_mapping.paused = False

    def reset(self):
        self.map = Map()
        self.local_mapping.map = self.map
        self.local_mapping.recent_points = []
        self.tracking.map = self.map
        self.tracking.state = TrackingState.NOT_INITIALIZED
        self.tracking.last_frame = None
        self.tracking.init_ref_frame = None
        self.tracking.velocity = None
        self.tracking.trajectory = []

    def shutdown(self):
        pass  # synchronous pipeline: nothing to join

    # -- introspection ------------------------------------------------------

    def get_tracking_state(self) -> TrackingState:
        return self.tracking.state

    def n_tracked_points(self) -> int:
        return self.tracking.n_last_inliers

    def map_changed(self) -> int:
        return self.map.big_change_idx

    # -- trajectory output (reference src/System.cc:347-503) ---------------

    def keyframe_trajectory(self):
        """[(timestamp, Tcw)] for good keyframes, id-ordered."""
        kfs = sorted(self.map.good_keyframes(), key=lambda k: k.kf_id)
        return [(kf.timestamp, kf.t_cw.copy()) for kf in kfs]

    def frame_trajectory(self):
        return list(self.tracking.trajectory)

    def save_trajectory_tum(self, path: str):
        """TUM format: timestamp tx ty tz qx qy qz qw (camera-to-world)."""
        with open(path, "w") as f:
            for ts, t_cw in self.tracking.trajectory:
                t_wc = np.linalg.inv(t_cw)
                q = np.asarray(rot_to_quat(jnp.asarray(t_wc[:3, :3])))
                t = t_wc[:3, 3]
                f.write(
                    f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
                )

    def save_keyframe_trajectory_tum(self, path: str):
        with open(path, "w") as f:
            for ts, t_cw in self.keyframe_trajectory():
                t_wc = np.linalg.inv(t_cw)
                q = np.asarray(rot_to_quat(jnp.asarray(t_wc[:3, :3])))
                t = t_wc[:3, 3]
                f.write(
                    f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
                )

    def save_trajectory_kitti(self, path: str):
        """KITTI format: 12 numbers per row (3x4 camera-to-world)."""
        with open(path, "w") as f:
            for _, t_cw in self.tracking.trajectory:
                t_wc = np.linalg.inv(t_cw)
                row = t_wc[:3].reshape(-1)
                f.write(" ".join(f"{x:.9e}" for x in row) + "\n")
