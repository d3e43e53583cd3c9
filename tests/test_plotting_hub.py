"""Plotting utilities (reference utils/plotting.py) and the HUB session
equivalent (hub/session.py + utils/callbacks/hub.py)."""

import json
import time

import numpy as np


def test_annotator_and_plot_images(tmp_path):
    from experiment_yolo_tpu.utils.plotting import Annotator, colors, plot_images

    im = np.zeros((96, 96, 3), np.uint8)
    ann = Annotator(im)
    ann.box_label([10, 10, 60, 60], "cat 0.9", colors(0, bgr=True))
    ann.kpts(np.asarray([[20, 20, 0.9], [40, 40, 0.9]]), kpt_line=False)
    ann.masks(np.zeros((1, 96, 96)) + (np.arange(96)[None, :, None] > 48))
    out = ann.result()
    assert out.shape == (96, 96, 3) and out.sum() > 0

    imgs = np.random.randint(0, 255, (4, 64, 64, 3), np.uint8)
    bboxes = np.full((4, 2, 4), 0.4, np.float32)
    cls = np.zeros((4, 2), np.int32)
    mask = np.ones((4, 2), bool)
    f = plot_images(imgs, bboxes, cls, mask, fname=tmp_path / "batch.jpg", names={0: "obj"})
    assert f.exists() and f.stat().st_size > 0


def test_plot_labels_and_features(tmp_path):
    from experiment_yolo_tpu.utils.plotting import feature_visualization, plot_labels

    bb = np.random.rand(50, 4).astype(np.float32)
    cls = np.random.randint(0, 3, 50)
    out = plot_labels(bb, cls, save_dir=tmp_path)
    assert out.exists()
    fmap = np.random.rand(1, 16, 16, 12).astype(np.float32)
    out2 = feature_visualization(fmap, "nn.Conv", 3, save_dir=tmp_path)
    assert out2 is not None and out2.exists()


def test_hub_session(tmp_path):
    from experiment_yolo_tpu.hub import HUBTrainingSession

    s = HUBTrainingSession("model1", root=tmp_path)
    s.metric_rate_limit = 0.0
    s.upload_metrics(0, {"loss": 1.5, "mAP50": 0.3})
    s.upload_metrics(1, {"loss": 1.2, "mAP50": 0.4})
    w = tmp_path / "w.ckpt"
    w.write_text("weights")
    s.upload_model(1, w, is_best=True)
    time.sleep(0.1)
    s.shutdown()
    lines = [json.loads(l) for l in (tmp_path / "model1" / "metrics.jsonl").read_text().splitlines()]
    assert lines and lines[0]["loss"] == 1.5
    assert (tmp_path / "model1" / "best.ckpt").exists()
    assert not s.alive


def test_hub_callbacks(tmp_path):
    from experiment_yolo_tpu.hub import HUBTrainingSession, add_hub_callbacks
    from experiment_yolo_tpu.utils.callbacks import Callbacks

    s = HUBTrainingSession("m2", root=tmp_path)
    s.metric_rate_limit = 0.0
    cbs = Callbacks()
    add_hub_callbacks(cbs, s)

    class T:
        loss_items = {"box": 0.5}
        metrics = {"fitness": 0.2}
        epoch = 3
        save_dir = tmp_path

    cbs.run("on_fit_epoch_end", trainer=T())
    cbs.run("on_train_end", trainer=T())
    assert (tmp_path / "m2" / "metrics.jsonl").exists()
    assert not s.alive
