"""Statistical harness + solutions tests."""

import numpy as np
import pytest

from experiment_yolo_tpu.solutions import Heatmap, ObjectCounter, SpeedEstimator
from experiment_yolo_tpu.utils.stats import bootstrap_indices, compare_scores


class TestStats:
    def test_identical_models_not_significant(self):
        rng = np.random.default_rng(0)
        a = 0.8 + rng.normal(0, 0.01, 30)
        r = compare_scores(a, a + rng.normal(0, 1e-4, 30))
        assert r.t_p > 0.05
        assert abs(r.mean_diff) < 1e-3

    def test_clearly_better_model_significant(self):
        rng = np.random.default_rng(0)
        b = 0.70 + rng.normal(0, 0.01, 30)
        a = b + 0.05 + rng.normal(0, 0.005, 30)
        r = compare_scores(a, b)
        assert r.t_p < 1e-6
        assert r.wilcoxon_p < 1e-3
        assert r.cohens_d > 2
        assert r.ci_t[0] > 0  # CI excludes zero
        assert "SIGNIFICANT" in r.summary()

    def test_bootstrap_indices_shape(self):
        idxs = bootstrap_indices(100, n_bootstrap=7, fraction=0.5, seed=1)
        assert len(idxs) == 7
        assert all(len(i) == 50 for i in idxs)
        assert all((i >= 0).all() and (i < 100).all() for i in idxs)


class TestSolutions:
    def test_object_counter_in_out(self):
        region = [(50, 0), (100, 0), (100, 100), (50, 100)]
        counter = ObjectCounter(region)
        # object 1 moves left->right through the region; object 2 stays out
        for x in (10, 30, 60, 80, 120, 140):
            boxes = np.asarray([[x - 5, 40, x + 5, 60], [5, 5, 15, 15]], float)
            counter.update(boxes, np.asarray([1, 2]), np.asarray([0, 0]))
        assert counter.in_count == 1
        assert counter.out_count == 1
        assert counter.classwise[0] == {"in": 1, "out": 1}

    def test_heatmap_accumulates_and_decays(self):
        hm = Heatmap((50, 50), decay=0.5)
        hm.update(np.asarray([[10, 10, 20, 20]]))
        v1 = hm.map[15, 15]
        hm.update(np.zeros((0, 4)))
        assert hm.map[15, 15] == pytest.approx(v1 * 0.5)
        img = hm.render()
        assert img.dtype == np.uint8 and img.max() == 255

    def test_speed_estimator(self):
        se = SpeedEstimator(fps=30.0)
        for t in range(6):
            boxes = np.asarray([[t * 10, 0, t * 10 + 10, 10]], float)
            speeds = se.update(boxes, np.asarray([7]))
        assert speeds[7] == pytest.approx(300.0, rel=0.01)  # 10 px/frame * 30 fps
        se_m = SpeedEstimator(fps=30.0, meters_per_pixel=0.1)
        for t in range(6):
            se_m.update(np.asarray([[t * 10, 0, t * 10 + 10, 10]], float), np.asarray([7]))
        assert se_m.speeds[7] == pytest.approx(30.0, rel=0.01)


def test_ai_gym_counts_reps():
    from experiment_yolo_tpu.solutions.solutions import AIGym

    gym = AIGym(kpts_to_check=(0, 1, 2), pose_type="pushup", pose_up_angle=150, pose_down_angle=70)
    # straight arm (angle ~180) then bent (angle ~45), twice = 2 reps
    straight = np.asarray([[[0, 0], [1, 0], [2, 0]]], np.float32)
    bent = np.asarray([[[0, 0], [1, 0], [0.5, 0.5]]], np.float32)
    for _ in range(2):
        gym.update(straight)
        counts = gym.update(bent)
    assert counts == [2]
    assert gym.stage == ["down"]


def test_distance_calculation():
    from experiment_yolo_tpu.solutions.solutions import DistanceCalculation

    dc = DistanceCalculation(pixels_per_meter=10.0)
    assert dc.distance() is None
    dc.select(1, [0, 0, 10, 10])
    dc.select(2, [30, 0, 50, 10])
    m, mm = dc.distance()
    assert m == pytest.approx(3.5)  # centroids (5,5) and (40,5): 35 px
    assert mm == pytest.approx(3500.0)
    dc.update(np.asarray([[0, 0, 10, 10], [40, 0, 60, 10]]), np.asarray([1, 2]))
    m2, _ = dc.distance()
    assert m2 == pytest.approx(4.5)
