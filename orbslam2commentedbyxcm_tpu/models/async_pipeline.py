"""Asynchronous mapping pipeline — the reference's thread parallelism.

The reference runs LocalMapping and LoopClosing on their own std::threads
(spawned in src/System.cc:98-111) with a keyframe queue capped at 3
(src/Tracking.cc:1173) and the map-wide `Map::mMutexMapUpdate` serializing
Tracking against map mutation (include/Map.h:114, held for the whole
`Track()`, src/Tracking.cc:343). `AsyncMapping` reproduces that structure
host-side:

  * one worker thread drains a keyframe queue and runs the wrapped
    LocalMapping stage (which chains into LoopClosing, like the reference's
    LocalMapping::Run -> LoopClosing::InsertKeyFrame handoff);
  * the caller (System) holds `map_lock` during Tracking's map section, the
    worker holds it during mapping — so ORB extraction / stereo matching
    (the device-heavy ~60% of a frame) overlaps mapping work, exactly the
    overlap the reference gets from its thread split;
  * backpressure mirrors the reference: Tracking's keyframe policy consults
    `accepts_keyframes()` (== `LocalMapping::AcceptKeyFrames`) and skips
    keyframe creation while >= 3 keyframes are pending.

All other attribute access delegates to the wrapped LocalMapping, so the
wrapper is a drop-in for System/Tracking wiring (paused flag, relocalizer,
map re-pointing on reset/load).
"""

from __future__ import annotations

import queue
import threading

QUEUE_CAP = 3  # reference src/Tracking.cc:1173


class AsyncMapping:
    _OWN = {"inner", "lock", "_queue", "_thread"}

    def __init__(self, inner, map_lock: threading.Lock):
        object.__setattr__(self, "inner", inner)
        object.__setattr__(self, "lock", map_lock)
        object.__setattr__(self, "_queue", queue.Queue())
        # reference CheckNewKeyFrames gate (src/LocalMapping.cc:63-71): the
        # wrapped stage defers fuse/BA/culling while newer KFs are queued
        inner.pending_check = lambda: not self._queue.empty()
        t = threading.Thread(target=self._run, daemon=True, name="local-mapping")
        object.__setattr__(self, "_thread", t)
        t.start()

    # -- delegation ----------------------------------------------------------

    def __getattr__(self, k):
        return getattr(self.inner, k)

    def __setattr__(self, k, v):
        if k in AsyncMapping._OWN:
            object.__setattr__(self, k, v)
        else:
            setattr(self.inner, k, v)

    # -- pipeline ------------------------------------------------------------

    def _run(self):
        while True:
            kf_id = self._queue.get()
            try:
                if kf_id is None:
                    return
                with self.lock:
                    self.inner.insert_keyframe(kf_id)
            finally:
                self._queue.task_done()

    def insert_keyframe(self, kf_id: int):
        """Enqueue; never blocks (the caller holds map_lock — the keyframe
        policy's accepts_keyframes() gate bounds the queue instead). Signals
        a running local BA to abort (reference LocalMapping::InsertKeyFrame
        sets mbAbortBA, src/LocalMapping.cc:117)."""
        self.inner.abort_ba = True
        self._queue.put(kf_id)

    def accepts_keyframes(self) -> bool:
        """== reference LocalMapping::AcceptKeyFrames / queue-cap check."""
        return self._queue.qsize() < QUEUE_CAP

    def initial_ba(self, kf1_id: int, kf2_id: int):
        # synchronous, like the reference's CreateInitialMapMonocular
        # (runs in the tracking thread, which already holds the map lock)
        self.inner.initial_ba(kf1_id, kf2_id)

    def wait_idle(self):
        """Block until every queued keyframe has been processed."""
        self._queue.join()

    def shutdown(self):
        if self._thread.is_alive():
            self._queue.put(None)
            self._thread.join(timeout=300)


class AsyncLoopClosing:
    """LoopClosing on its own worker thread (reference src/System.cc:105-111):
    the mapping stage hands finished keyframes to this queue and returns
    immediately, so place recognition / Sim3 / correction never stall the
    mapping worker. The worker holds the map lock while mutating; a loop
    correction's global BA still runs on the separate transient GBA thread."""

    _OWN = {"inner", "lock", "_queue", "_thread"}

    def __init__(self, inner, map_lock: threading.Lock):
        object.__setattr__(self, "inner", inner)
        object.__setattr__(self, "lock", map_lock)
        object.__setattr__(self, "_queue", queue.Queue())
        t = threading.Thread(target=self._run, daemon=True, name="loop-closing")
        object.__setattr__(self, "_thread", t)
        t.start()

    def __getattr__(self, k):
        return getattr(self.inner, k)

    def __setattr__(self, k, v):
        if k in AsyncLoopClosing._OWN:
            object.__setattr__(self, k, v)
        else:
            setattr(self.inner, k, v)

    def _run(self):
        while True:
            kf_id = self._queue.get()
            try:
                if kf_id is None:
                    return
                with self.lock:
                    self.inner.insert_keyframe(kf_id)
            finally:
                self._queue.task_done()

    def insert_keyframe(self, kf_id: int):
        self._queue.put(kf_id)

    def wait_idle(self):
        self._queue.join()

    def shutdown(self):
        if self._thread.is_alive():
            self._queue.put(None)
            self._thread.join(timeout=300)
