"""Kalman filters for box tracking.

Rebuild of the reference's ``trackers/utils/kalman_filter.py`` (360 LoC):
constant-velocity Kalman filter over (x, y, a, h) — center, aspect ratio,
height — and the (x, y, w, h) variant BoT-SORT uses. Host-side numpy (the
tracker runs per frame on a handful of boxes; not a jit target).
"""

from __future__ import annotations

import numpy as np

# 0.95 quantile of chi-square distribution, used as Mahalanobis gate
chi2inv95 = {1: 3.8415, 2: 5.9915, 3: 7.8147, 4: 9.4877, 5: 11.070, 6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919}


class KalmanFilterXYAH:
    """8-dim state (x, y, a, h, vx, vy, va, vh), 4-dim measurement."""

    def __init__(self):
        ndim, dt = 4, 1.0
        self._motion_mat = np.eye(2 * ndim)
        for i in range(ndim):
            self._motion_mat[i, ndim + i] = dt
        self._update_mat = np.eye(ndim, 2 * ndim)
        self._std_weight_position = 1.0 / 20
        self._std_weight_velocity = 1.0 / 160

    def initiate(self, measurement: np.ndarray):
        mean_pos = measurement
        mean_vel = np.zeros_like(mean_pos)
        mean = np.r_[mean_pos, mean_vel]
        std = [
            2 * self._std_weight_position * measurement[3],
            2 * self._std_weight_position * measurement[3],
            1e-2,
            2 * self._std_weight_position * measurement[3],
            10 * self._std_weight_velocity * measurement[3],
            10 * self._std_weight_velocity * measurement[3],
            1e-5,
            10 * self._std_weight_velocity * measurement[3],
        ]
        covariance = np.diag(np.square(std))
        return mean, covariance

    def _motion_cov(self, mean):
        std_pos = [
            self._std_weight_position * mean[3],
            self._std_weight_position * mean[3],
            1e-2,
            self._std_weight_position * mean[3],
        ]
        std_vel = [
            self._std_weight_velocity * mean[3],
            self._std_weight_velocity * mean[3],
            1e-5,
            self._std_weight_velocity * mean[3],
        ]
        return np.diag(np.square(np.r_[std_pos, std_vel]))

    def predict(self, mean, covariance):
        motion_cov = self._motion_cov(mean)
        mean = self._motion_mat @ mean
        covariance = self._motion_mat @ covariance @ self._motion_mat.T + motion_cov
        return mean, covariance

    def project(self, mean, covariance):
        std = [
            self._std_weight_position * mean[3],
            self._std_weight_position * mean[3],
            1e-1,
            self._std_weight_position * mean[3],
        ]
        innovation_cov = np.diag(np.square(std))
        mean_p = self._update_mat @ mean
        covariance_p = self._update_mat @ covariance @ self._update_mat.T
        return mean_p, covariance_p + innovation_cov

    def multi_predict(self, means, covariances):
        """Vectorized predict over N tracks: (N,8), (N,8,8)."""
        if len(means) == 0:
            return means, covariances
        std_pos = np.stack(
            [
                self._std_weight_position * means[:, 3],
                self._std_weight_position * means[:, 3],
                np.full(len(means), 1e-2),
                self._std_weight_position * means[:, 3],
            ],
            1,
        )
        std_vel = np.stack(
            [
                self._std_weight_velocity * means[:, 3],
                self._std_weight_velocity * means[:, 3],
                np.full(len(means), 1e-5),
                self._std_weight_velocity * means[:, 3],
            ],
            1,
        )
        sqr = np.square(np.concatenate([std_pos, std_vel], 1))
        means = means @ self._motion_mat.T
        covariances = self._motion_mat @ covariances @ self._motion_mat.T
        covariances = covariances + np.stack([np.diag(s) for s in sqr])
        return means, covariances

    def update(self, mean, covariance, measurement):
        projected_mean, projected_cov = self.project(mean, covariance)
        chol = np.linalg.cholesky(projected_cov)
        kalman_gain = np.linalg.solve(
            chol.T, np.linalg.solve(chol, (covariance @ self._update_mat.T).T)
        ).T
        innovation = measurement - projected_mean
        mean = mean + kalman_gain @ innovation
        covariance = covariance - kalman_gain @ projected_cov @ kalman_gain.T
        return mean, covariance

    def gating_distance(self, mean, covariance, measurements, only_position=False):
        mean_p, cov_p = self.project(mean, covariance)
        if only_position:
            mean_p, cov_p = mean_p[:2], cov_p[:2, :2]
            measurements = measurements[:, :2]
        d = measurements - mean_p
        chol = np.linalg.cholesky(cov_p)
        z = np.linalg.solve(chol, d.T)
        return np.sum(z * z, axis=0)


class KalmanFilterXYWH(KalmanFilterXYAH):
    """Same filter over (x, y, w, h) — BoT-SORT's measurement space."""

    def initiate(self, measurement: np.ndarray):
        mean_pos = measurement
        mean_vel = np.zeros_like(mean_pos)
        mean = np.r_[mean_pos, mean_vel]
        std = [
            2 * self._std_weight_position * measurement[2],
            2 * self._std_weight_position * measurement[3],
            2 * self._std_weight_position * measurement[2],
            2 * self._std_weight_position * measurement[3],
            10 * self._std_weight_velocity * measurement[2],
            10 * self._std_weight_velocity * measurement[3],
            10 * self._std_weight_velocity * measurement[2],
            10 * self._std_weight_velocity * measurement[3],
        ]
        return mean, np.diag(np.square(std))

    def _motion_cov(self, mean):
        std_pos = [
            self._std_weight_position * mean[2],
            self._std_weight_position * mean[3],
            self._std_weight_position * mean[2],
            self._std_weight_position * mean[3],
        ]
        std_vel = [
            self._std_weight_velocity * mean[2],
            self._std_weight_velocity * mean[3],
            self._std_weight_velocity * mean[2],
            self._std_weight_velocity * mean[3],
        ]
        return np.diag(np.square(np.r_[std_pos, std_vel]))

    def project(self, mean, covariance):
        std = [
            self._std_weight_position * mean[2],
            self._std_weight_position * mean[3],
            self._std_weight_position * mean[2],
            self._std_weight_position * mean[3],
        ]
        innovation_cov = np.diag(np.square(std))
        mean_p = self._update_mat @ mean
        covariance_p = self._update_mat @ covariance @ self._update_mat.T
        return mean_p, covariance_p + innovation_cov

    def multi_predict(self, means, covariances):
        if len(means) == 0:
            return means, covariances
        std_pos = np.stack(
            [
                self._std_weight_position * means[:, 2],
                self._std_weight_position * means[:, 3],
                self._std_weight_position * means[:, 2],
                self._std_weight_position * means[:, 3],
            ],
            1,
        )
        std_vel = np.stack(
            [
                self._std_weight_velocity * means[:, 2],
                self._std_weight_velocity * means[:, 3],
                self._std_weight_velocity * means[:, 2],
                self._std_weight_velocity * means[:, 3],
            ],
            1,
        )
        sqr = np.square(np.concatenate([std_pos, std_vel], 1))
        means = means @ self._motion_mat.T
        covariances = self._motion_mat @ covariances @ self._motion_mat.T
        covariances = covariances + np.stack([np.diag(s) for s in sqr])
        return means, covariances
