"""BoT-SORT tracker: ByteTrack + camera motion compensation (+ optional ReID).

Rebuild of the reference's ``trackers/bot_sort.py`` (200 LoC): XYWH Kalman
space, GMC-warped predictions before association, proximity+appearance
costs when ReID features are supplied (off by default, like the
reference's botsort.yaml with_reid=False).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from experiment_yolo_tpu.trackers import matching
from experiment_yolo_tpu.trackers.byte_tracker import BYTETracker, STrack, TrackState
from experiment_yolo_tpu.trackers.gmc import GMC
from experiment_yolo_tpu.trackers.kalman_filter import KalmanFilterXYWH


class BOTrack(STrack):
    shared_kalman = KalmanFilterXYWH()

    def __init__(self, xywh, score, cls, feat: Optional[np.ndarray] = None, feat_history: int = 50):
        super().__init__(xywh, score, cls)
        self.smooth_feat = None
        self.curr_feat = None
        self.alpha = 0.9
        self.features: List[np.ndarray] = []
        self.feat_history = feat_history
        if feat is not None:
            self.update_features(feat)

    def update_features(self, feat: np.ndarray) -> None:
        feat = feat / (np.linalg.norm(feat) + 1e-12)
        self.curr_feat = feat
        self.smooth_feat = feat if self.smooth_feat is None else self.alpha * self.smooth_feat + (1 - self.alpha) * feat
        self.features.append(feat)
        if len(self.features) > self.feat_history:
            self.features.pop(0)
        self.smooth_feat /= np.linalg.norm(self.smooth_feat) + 1e-12

    # XYWH measurement space (vs XYAH in ByteTrack)
    @property
    def tlwh(self) -> np.ndarray:
        if self.mean is None:
            return self._tlwh.copy()
        ret = self.mean[:4].copy()  # (x, y, w, h)
        ret[:2] -= ret[2:] / 2
        return ret

    @staticmethod
    def tlwh_to_xywh(tlwh: np.ndarray) -> np.ndarray:
        ret = np.asarray(tlwh, np.float32).copy()
        ret[:2] += ret[2:] / 2
        return ret

    def activate(self, kalman_filter, frame_id: int) -> None:
        self.kalman_filter = kalman_filter
        self.track_id = self.next_id()
        self.mean, self.covariance = kalman_filter.initiate(self.tlwh_to_xywh(self._tlwh))
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        self.is_activated = frame_id == 1
        self.frame_id = frame_id
        self.start_frame = frame_id

    def re_activate(self, new_track, frame_id: int, new_id: bool = False) -> None:
        if new_track.curr_feat is not None:
            self.update_features(new_track.curr_feat)
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, self.tlwh_to_xywh(new_track._tlwh)
        )
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        self.is_activated = True
        self.frame_id = frame_id
        if new_id:
            self.track_id = self.next_id()
        self.score = new_track.score
        self.cls = new_track.cls

    def update(self, new_track, frame_id: int) -> None:
        if new_track.curr_feat is not None:
            self.update_features(new_track.curr_feat)
        self.frame_id = frame_id
        self.tracklet_len += 1
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, self.tlwh_to_xywh(new_track._tlwh)
        )
        self.state = TrackState.Tracked
        self.is_activated = True
        self.score = new_track.score
        self.cls = new_track.cls

    def predict(self) -> None:
        mean_state = self.mean.copy()
        if self.state != TrackState.Tracked:
            mean_state[6] = 0
            mean_state[7] = 0
        self.mean, self.covariance = self.kalman_filter.predict(mean_state, self.covariance)

    @staticmethod
    def multi_predict(stracks: List["BOTrack"]) -> None:
        if not stracks:
            return
        means = np.stack([st.mean.copy() for st in stracks])
        covs = np.stack([st.covariance for st in stracks])
        for i, st in enumerate(stracks):
            if st.state != TrackState.Tracked:
                means[i][6] = 0
                means[i][7] = 0
        means, covs = BOTrack.shared_kalman.multi_predict(means, covs)
        for st, m, c in zip(stracks, means, covs):
            st.mean, st.covariance = m, c

    @staticmethod
    def multi_gmc(stracks: List["BOTrack"], h_mat: np.ndarray) -> None:
        """Warp track states by the camera-motion affine."""
        if not stracks:
            return
        r = h_mat[:2, :2]
        r8 = np.kron(np.eye(4), r)
        t = h_mat[:2, 2]
        for st in stracks:
            mean = r8 @ st.mean
            mean[:2] += t
            st.mean = mean
            st.covariance = r8 @ st.covariance @ r8.T


class BOTSORT(BYTETracker):
    def __init__(
        self,
        track_high_thresh: float = 0.5,
        track_low_thresh: float = 0.1,
        new_track_thresh: float = 0.6,
        track_buffer: int = 30,
        match_thresh: float = 0.8,
        frame_rate: int = 30,
        proximity_thresh: float = 0.5,
        appearance_thresh: float = 0.25,
        with_reid: bool = False,
        gmc_method: str = "sparseOptFlow",
        fuse_score: bool = True,
    ):
        super().__init__(
            track_high_thresh, track_low_thresh, new_track_thresh, track_buffer, match_thresh,
            frame_rate, fuse_score,
        )
        self.proximity_thresh = proximity_thresh
        self.appearance_thresh = appearance_thresh
        self.with_reid = with_reid
        self.encoder = None  # ReID model hook
        self.gmc = GMC(method=gmc_method)
        self._frame_for_gmc: Optional[np.ndarray] = None

    def get_kalmanfilter(self):
        return KalmanFilterXYWH()

    def init_track(self, xywh, scores, cls) -> List[BOTrack]:
        if len(xywh) == 0:
            return []
        if self.with_reid and self.encoder is not None and self._frame_for_gmc is not None:
            feats = self.encoder(self._frame_for_gmc, xywh)
            return [BOTrack(b, s, c, f) for b, s, c, f in zip(xywh, scores, cls, feats)]
        return [BOTrack(b, s, c) for b, s, c in zip(xywh, scores, cls)]

    def get_dists(self, tracks, detections):
        dists = matching.iou_distance(tracks, detections)
        dists_mask = dists > self.proximity_thresh
        if self.fuse:
            dists = matching.fuse_score(dists, detections)
        if self.with_reid and all(getattr(d, "smooth_feat", None) is not None for d in detections) and tracks:
            emb = np.asarray([t.smooth_feat for t in tracks]) @ np.asarray(
                [d.smooth_feat for d in detections]
            ).T
            emb_dists = (1.0 - emb) / 2.0
            emb_dists[emb_dists > self.appearance_thresh] = 1.0
            emb_dists[dists_mask] = 1.0
            dists = np.minimum(dists, emb_dists)
        return dists

    def multi_predict(self, tracks):
        BOTrack.multi_predict(tracks)

    def update(self, boxes_xywh, scores, classes, frame: Optional[np.ndarray] = None) -> np.ndarray:
        self._frame_for_gmc = frame
        if frame is not None:
            h_mat = self.gmc.apply(frame)
            BOTrack.multi_gmc([t for t in self.tracked_stracks], h_mat)
            BOTrack.multi_gmc(self.lost_stracks, h_mat)
        return super().update(boxes_xywh, scores, classes)

    def reset(self) -> None:
        super().reset()
        self.gmc.reset_params()
