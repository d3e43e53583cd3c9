"""mAP machinery tests: matching, AP computation, DetMetrics edge cases."""

import numpy as np
import pytest

from experiment_yolo_tpu.utils.metrics import (
    DetMetrics,
    IOUV,
    ap_per_class,
    box_iou_np,
    compute_ap,
    match_predictions,
)


def test_perfect_predictions_map_1():
    m = DetMetrics()
    gt = np.asarray([[10, 10, 50, 50], [100, 100, 150, 160]], np.float32)
    cls = np.asarray([0.0, 1.0])
    iou = box_iou_np(gt, gt)
    tp = match_predictions(cls, cls, iou)
    assert tp.all()  # exact boxes: TP at every threshold
    m.update(tp, np.asarray([0.9, 0.8]), cls, cls)
    r = m.result()
    # 0.995, not 1.0: the reference's 101-point interp zeroes the final
    # trapezoid segment via the appended (recall=1, precision=0) sentinel —
    # we reproduce that exactly for mAP parity (metrics.py:compute_ap).
    assert r["mAP50"] == pytest.approx(0.995, abs=1e-3)
    assert r["mAP50-95"] == pytest.approx(0.995, abs=1e-3)


def test_wrong_class_never_matches():
    gt = np.asarray([[10, 10, 50, 50]], np.float32)
    iou = box_iou_np(gt, gt)
    tp = match_predictions(np.asarray([1.0]), np.asarray([0.0]), iou)
    assert not tp.any()


def test_duplicate_predictions_one_tp():
    gt = np.asarray([[10, 10, 50, 50]], np.float32)
    pred = np.asarray([[10, 10, 50, 50], [11, 11, 51, 51]], np.float32)
    iou = box_iou_np(pred, gt)
    tp = match_predictions(np.zeros(2), np.zeros(1), iou)
    assert tp[:, 0].sum() == 1  # only one prediction counts as TP at 0.5


def test_loose_box_only_low_thresholds():
    gt = np.asarray([[0, 0, 100, 100]], np.float32)
    pred = np.asarray([[0, 0, 100, 60]], np.float32)  # IoU 0.6
    iou = box_iou_np(pred, gt)
    tp = match_predictions(np.zeros(1), np.zeros(1), iou)
    expected = IOUV <= 0.6 + 1e-9
    np.testing.assert_array_equal(tp[0], expected)


def test_fp_reduces_precision_not_recall():
    gt = np.asarray([[10, 10, 50, 50]], np.float32)
    pred = np.asarray([[10, 10, 50, 50], [200, 200, 240, 240]], np.float32)
    iou = box_iou_np(pred, gt)
    tp = match_predictions(np.zeros(2), np.zeros(1), iou)
    m = DetMetrics()
    m.update(tp, np.asarray([0.9, 0.8]), np.zeros(2), np.zeros(1))
    r = m.result()
    assert r["recall"] == pytest.approx(1.0, abs=1e-3)
    assert r["mAP50"] == pytest.approx(1.0, abs=1e-2)  # FP after TP: AP ~ 1


def test_compute_ap_monotone_envelope():
    ap, mpre, mrec = compute_ap(np.asarray([0.0, 0.5, 1.0]), np.asarray([1.0, 0.6, 0.8]))
    assert 0.5 < ap <= 1.0


def test_empty_metrics():
    m = DetMetrics()
    r = m.result()
    assert r["fitness"] == 0.0
    # detections but no gt anywhere
    m.update(np.zeros((2, 10), bool), np.asarray([0.5, 0.4]), np.zeros(2), np.zeros(0))
    assert m.result()["mAP50"] == 0.0


def test_val_plots_curve_figures(tmp_path):
    """plots=True validation writes PR/F1/P/R curves + confusion matrix
    (reference metrics.py:1060-1107 plot_pr_curve/plot_mc_curve)."""
    import jax
    from pathlib import Path

    from experiment_yolo_tpu.data import make_synthetic_dataset
    from experiment_yolo_tpu.engine.validator import DetectionValidator
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    data = make_synthetic_dataset(tmp_path / "ds", n_train=4, n_val=4, imgsz=96)
    tiny = str(Path(__file__).parent / "assets" / "tiny.yaml")
    model = DetectionModel(tiny, nc=3)
    variables = model.init(jax.random.PRNGKey(0))
    v = DetectionValidator(args={"data": str(data), "imgsz": 96, "batch": 4,
                                 "plots": True, "project": str(tmp_path / "out"),
                                 "verbose": False})
    v(model, variables)
    for f in ("PR_curve.png", "F1_curve.png", "P_curve.png", "R_curve.png",
              "confusion_matrix.png"):
        assert (tmp_path / "out" / f).exists(), f


def test_ap_per_class_curves_shapes():
    import numpy as np

    from experiment_yolo_tpu.utils.metrics import ap_per_class

    rng = np.random.RandomState(0)
    n = 200
    tp = rng.rand(n, 10) > 0.5
    r = ap_per_class(tp, rng.rand(n), rng.randint(0, 3, n),
                     rng.randint(0, 3, 50), curves=True)
    assert r["px"].shape == (1000,)
    k = len(r["unique_classes"])
    for key in ("p_curve", "r_curve", "f1_curve", "prec_values"):
        assert r[key].shape == (k, 1000), key
    # curve outputs must not change the headline metrics
    r2 = ap_per_class(tp, rng.rand(n), rng.randint(0, 3, n),
                      rng.randint(0, 3, 50))
    assert set(r2) <= set(ap_per_class(tp, rng.rand(n), rng.randint(0, 3, n),
                                       rng.randint(0, 3, 50), curves=True))
