"""Global motion compensation (camera motion) for BoT-SORT.

Rebuild of the reference's ``trackers/utils/gmc.py`` (365 LoC): estimates a
frame-to-frame affine transform from sparse optical flow (or ORB/ECC) and
warps predicted track boxes before association.
"""

from __future__ import annotations

from typing import Optional

import cv2
import numpy as np


class GMC:
    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        self.method = method
        self.downscale = max(1, int(downscale))
        self.prev_frame: Optional[np.ndarray] = None
        self.prev_pts: Optional[np.ndarray] = None
        self.initialized = False
        if method in ("none", "None", None):
            self.method = "none"

    def apply(self, raw_frame: np.ndarray) -> np.ndarray:
        """Returns a 2x3 affine H mapping previous frame coords to current."""
        if self.method == "none":
            return np.eye(2, 3)
        if self.method == "sparseOptFlow":
            return self._apply_sparseoptflow(raw_frame)
        if self.method == "ecc":
            return self._apply_ecc(raw_frame)
        if self.method == "orb":
            return self._apply_features(raw_frame)
        raise ValueError(f"unknown GMC method {self.method!r}")

    def _gray_small(self, frame):
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY) if frame.ndim == 3 else frame
        if self.downscale > 1:
            gray = cv2.resize(gray, (gray.shape[1] // self.downscale, gray.shape[0] // self.downscale))
        return gray

    def _apply_sparseoptflow(self, raw_frame):
        h_mat = np.eye(2, 3)
        frame = self._gray_small(raw_frame)
        keypoints = cv2.goodFeaturesToTrack(
            frame, maxCorners=1000, qualityLevel=0.01, minDistance=1, blockSize=3
        )
        if not self.initialized or self.prev_pts is None or keypoints is None:
            self.prev_frame = frame.copy()
            self.prev_pts = keypoints
            self.initialized = True
            return h_mat
        matched, status, _ = cv2.calcOpticalFlowPyrLK(self.prev_frame, frame, self.prev_pts, None)
        if matched is not None and status is not None:
            prev_ok = self.prev_pts[status.flatten() == 1]
            curr_ok = matched[status.flatten() == 1]
            if len(prev_ok) > 4:
                m, _ = cv2.estimateAffinePartial2D(prev_ok, curr_ok, method=cv2.RANSAC)
                if m is not None:
                    h_mat = m.copy()
                    h_mat[0, 2] *= self.downscale
                    h_mat[1, 2] *= self.downscale
        self.prev_frame = frame.copy()
        self.prev_pts = keypoints
        return h_mat

    def _apply_ecc(self, raw_frame):
        frame = self._gray_small(raw_frame)
        h_mat = np.eye(2, 3, dtype=np.float32)
        if not self.initialized:
            self.prev_frame = frame.copy()
            self.initialized = True
            return h_mat
        criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 100, 1e-5)
        try:
            _, h_mat = cv2.findTransformECC(self.prev_frame, frame, h_mat, cv2.MOTION_EUCLIDEAN, criteria)
            h_mat = h_mat.copy()
            h_mat[0, 2] *= self.downscale
            h_mat[1, 2] *= self.downscale
        except cv2.error:
            pass
        self.prev_frame = frame.copy()
        return h_mat

    def _apply_features(self, raw_frame):
        frame = self._gray_small(raw_frame)
        detector = cv2.FastFeatureDetector_create(20)
        extractor = cv2.ORB_create()
        kp = detector.detect(frame, None)
        kp, desc = extractor.compute(frame, kp)
        h_mat = np.eye(2, 3)
        if self.initialized and getattr(self, "prev_desc", None) is not None and desc is not None:
            matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
            matches = matcher.knnMatch(self.prev_desc, desc, 2)
            good = [m for m, n in (p for p in matches if len(p) == 2) if m.distance < 0.9 * n.distance]
            if len(good) > 4:
                prev_pts = np.float32([self.prev_kp[m.queryIdx].pt for m in good])
                curr_pts = np.float32([kp[m.trainIdx].pt for m in good])
                m_est, _ = cv2.estimateAffinePartial2D(prev_pts, curr_pts, method=cv2.RANSAC)
                if m_est is not None:
                    h_mat = m_est.copy()
                    h_mat[0, 2] *= self.downscale
                    h_mat[1, 2] *= self.downscale
        self.prev_frame = frame.copy()
        self.prev_kp, self.prev_desc = kp, desc
        self.initialized = True
        return h_mat

    def reset_params(self) -> None:
        self.prev_frame = None
        self.prev_pts = None
        self.initialized = False
