"""ConfusionMatrix semantics tests."""

import numpy as np
import pytest

from experiment_yolo_tpu.utils.metrics import ConfusionMatrix


def test_perfect_match_diagonal():
    cm = ConfusionMatrix(nc=3)
    gt_b = np.asarray([[0, 0, 10, 10], [50, 50, 80, 90]], float)
    gt_c = np.asarray([0, 2])
    det = np.asarray([[0, 0, 10, 10, 0.9, 0], [50, 50, 80, 90, 0.8, 2]], float)
    cm.process_batch(det, gt_b, gt_c)
    assert cm.matrix[0, 0] == 1 and cm.matrix[2, 2] == 1
    assert cm.matrix.sum() == 2


def test_misclassification_off_diagonal():
    cm = ConfusionMatrix(nc=3)
    gt_b = np.asarray([[0, 0, 10, 10]], float)
    cm.process_batch(np.asarray([[0, 0, 10, 10, 0.9, 1]], float), gt_b, np.asarray([0]))
    assert cm.matrix[1, 0] == 1  # predicted 1, true 0


def test_fp_and_fn_background():
    cm = ConfusionMatrix(nc=2)
    # FN: gt with no detections
    cm.process_batch(np.zeros((0, 6)), np.asarray([[0, 0, 10, 10]], float), np.asarray([1]))
    assert cm.matrix[2, 1] == 1
    # FP: detection with no gt
    cm.process_batch(np.asarray([[0, 0, 10, 10, 0.9, 0]], float), np.zeros((0, 4)), np.zeros(0))
    assert cm.matrix[0, 2] == 1
    tp, fp = cm.tp_fp()
    assert tp.sum() == 0 and fp.sum() == 1


def test_conf_gate():
    cm = ConfusionMatrix(nc=2, conf=0.5)
    gt_b = np.asarray([[0, 0, 10, 10]], float)
    cm.process_batch(np.asarray([[0, 0, 10, 10, 0.3, 0]], float), gt_b, np.asarray([0]))
    assert cm.matrix[0, 0] == 0 and cm.matrix[2, 0] == 1  # gated out -> FN


def test_plot(tmp_path):
    cm = ConfusionMatrix(nc=2)
    cm.process_batch(
        np.asarray([[0, 0, 10, 10, 0.9, 0]], float), np.asarray([[0, 0, 10, 10]], float), np.asarray([0])
    )
    p = cm.plot(tmp_path / "cm.png", names={0: "a", 1: "b"})
    assert p.exists() or (tmp_path / "cm.png").exists()
