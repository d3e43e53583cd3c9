"""Tracker tests: synthetic moving objects through ByteTrack / BoT-SORT."""

import numpy as np
import pytest

from experiment_yolo_tpu.trackers import BOTSORT, BYTETracker
from experiment_yolo_tpu.trackers.kalman_filter import KalmanFilterXYAH


def _frame_dets(t, n=2, conf=0.9):
    """n objects moving right at 5 px/frame, xywh format."""
    boxes = np.asarray(
        [[50 + 5 * t + 200 * i, 100 + 100 * i, 40, 40] for i in range(n)], np.float32
    )
    scores = np.full(n, conf, np.float32)
    classes = np.zeros(n, np.float32)
    return boxes, scores, classes


def test_kalman_tracks_constant_velocity():
    kf = KalmanFilterXYAH()
    mean, cov = kf.initiate(np.asarray([100.0, 100.0, 1.0, 40.0]))
    for t in range(1, 6):
        mean, cov = kf.predict(mean, cov)
        mean, cov = kf.update(mean, cov, np.asarray([100.0 + 5 * t, 100.0, 1.0, 40.0]))
    # learned velocity ~5 px/frame
    assert mean[4] == pytest.approx(5.0, abs=1.0)


def test_bytetrack_id_consistency():
    tracker = BYTETracker()
    ids_per_frame = []
    for t in range(10):
        out = tracker.update(*_frame_dets(t))
        ids_per_frame.append(sorted(out[:, 4].astype(int).tolist()))
    # after activation, IDs stay constant
    assert ids_per_frame[1] == ids_per_frame[9]
    assert len(ids_per_frame[9]) == 2


def test_bytetrack_low_conf_rescue():
    tracker = BYTETracker(track_high_thresh=0.5, track_low_thresh=0.1, new_track_thresh=0.6)
    for t in range(3):
        out = tracker.update(*_frame_dets(t, n=1, conf=0.9))
    tid = int(out[0, 4])
    # occlusion: detection drops to low confidence; track must survive via stage 2
    b, s, c = _frame_dets(3, n=1, conf=0.3)
    out = tracker.update(b, s, c)
    assert len(out) == 1 and int(out[0, 4]) == tid
    # back to high conf, same id
    out = tracker.update(*_frame_dets(4, n=1, conf=0.9))
    assert int(out[0, 4]) == tid


def test_bytetrack_lost_and_new():
    tracker = BYTETracker(track_buffer=2)
    for t in range(3):
        out = tracker.update(*_frame_dets(t, n=1))
    # object disappears for > buffer frames
    empty = (np.zeros((0, 4), np.float32), np.zeros(0, np.float32), np.zeros(0, np.float32))
    for _ in range(4):
        out = tracker.update(*empty)
    assert len(out) == 0
    # reappears far away -> new id
    b = np.asarray([[400.0, 300.0, 40, 40]], np.float32)
    tracker.update(b, np.asarray([0.9], np.float32), np.zeros(1, np.float32))
    out = tracker.update(b, np.asarray([0.9], np.float32), np.zeros(1, np.float32))
    assert len(out) == 1


def test_botsort_with_gmc_frames():
    tracker = BOTSORT(gmc_method="sparseOptFlow")
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (240, 320, 3), np.uint8)
    ids = []
    for t in range(6):
        b, s, c = _frame_dets(t, n=2)
        out = tracker.update(b, s, c, frame=frame)
        if len(out):
            ids.append(sorted(out[:, 4].astype(int).tolist()))
    assert ids[-1] == ids[1]
    assert len(ids[-1]) == 2
