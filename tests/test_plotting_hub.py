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


def test_settings_profile_retry(tmp_path):
    from experiment_yolo_tpu.utils import Profile, SettingsManager, TryExcept, get_latest_run, retry

    sm = SettingsManager(tmp_path / "s.json")
    sm.update(wandb=False)
    sm2 = SettingsManager(tmp_path / "s.json")
    assert sm2["wandb"] is False
    sm2.reset()
    assert SettingsManager(tmp_path / "s.json")["wandb"] is True

    calls = []

    @retry(times=3, delay=0.0)
    def flaky():
        calls.append(1)
        if len(calls) < 2:
            raise RuntimeError("nope")
        return "ok"

    assert flaky() == "ok" and len(calls) == 2

    with Profile() as p:
        pass
    assert p.dt >= 0

    (tmp_path / "exp" / "weights" / "last").mkdir(parents=True)
    assert get_latest_run(tmp_path).endswith("last")


def test_strip_optimizer(tmp_path):
    import numpy as np

    from experiment_yolo_tpu.engine.checkpoint import save_checkpoint
    from experiment_yolo_tpu.nn.tasks import DetectionModel
    from experiment_yolo_tpu.utils import strip_optimizer

    import jax

    m = DetectionModel("yolov8.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0))
    ck = tmp_path / "weights" / "last"
    save_checkpoint(ck, m, v, ema_variables=v, opt_state={"momentum": v["params"]},
                    meta={"epoch": 1})
    out = strip_optimizer(ck)
    # stripped state restores and is fp16
    from experiment_yolo_tpu.engine.checkpoint import _restore_as_numpy

    st = _restore_as_numpy(out / "state")
    leaf = jax.tree.leaves(st["variables"]["params"])[0]
    assert np.asarray(leaf).dtype == np.float16
    assert "ema_variables" not in st and "opt_state" not in st


def test_model_profile_table():
    """Per-layer FLOPs table (reference BaseModel._profile_one_layer)."""
    import jax

    from experiment_yolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8.yaml", nc=3)
    rows = m.profile(imgsz=128, verbose=False)
    assert len(rows) == len(m.specs)
    tot = sum(r["gflops"] for r in rows if r["gflops"] == r["gflops"])
    assert tot > 0
    assert sum(r["params"] for r in rows) == m.num_params_static()
