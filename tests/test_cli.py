"""CLI entrypoint (cfg/cli.py) — mode routing, special commands, and the
k=v grammar (reference ultralytics/cfg/__init__.py:426-573 `entrypoint`)."""

from pathlib import Path

import pytest

from experiment_yolo_tpu.cfg.cli import MODES, entrypoint, parse_key_value

ASSETS = Path(__file__).parent / "assets"
IMG = Path("/root/reference/assets/bus.jpg")


def test_parse_key_value_coercion():
    out = parse_key_value(["a=1", "b=0.5", "c=true", "d=none", "e=x,y", "f=[1,2]"])
    assert out == {"a": 1, "b": 0.5, "c": True, "d": None, "e": "x,y", "f": [1, 2]}
    with pytest.raises(SyntaxError):
        parse_key_value(["noequals"])


def test_invalid_mode_and_unknown_key():
    with pytest.raises(SyntaxError, match="invalid mode"):
        entrypoint(["frobnicate"])
    with pytest.raises(Exception):  # check_dict_alignment mismatch
        entrypoint(["val", "model=yolov8n.yaml", "bogus_key=1"])


def test_version_and_cfg_and_checks(capsys):
    from experiment_yolo_tpu import __version__

    assert entrypoint(["version"]) == __version__
    assert entrypoint(["cfg"]) is None
    assert entrypoint(["checks"]) is None


def test_settings_show_set_and_login(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    s = entrypoint(["settings"])
    assert s["runs_dir"] == "runs"
    s2 = entrypoint(["settings", "tensorboard=false"])
    assert s2["tensorboard"] is False
    # persisted
    assert entrypoint(["settings"])["tensorboard"] is False
    with pytest.raises(SyntaxError, match="unknown settings"):
        entrypoint(["settings", "nope=1"])

    entrypoint(["login", "api_key=k123"])
    assert entrypoint(["settings"]).get("api_key") == "k123"
    entrypoint(["logout"])
    assert "api_key" not in entrypoint(["settings"])


def test_copy_cfg(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    dst = entrypoint(["copy-cfg"])
    assert dst.exists() and "epochs" in dst.read_text()


@pytest.mark.skipif(not IMG.exists(), reason="no asset image")
def test_predict_track_export_modes(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    results = entrypoint(["predict", "model=yolov8n.yaml", f"source={IMG}",
                          "imgsz=192", "conf=0.001", "save=false"])
    assert len(results) == 1

    frames = tmp_path / "frames"
    frames.mkdir()
    import shutil

    shutil.copy(IMG, frames / "f0.jpg")
    shutil.copy(IMG, frames / "f1.jpg")
    tracked = entrypoint(["track", "model=yolov8n.yaml", f"source={frames}",
                          "imgsz=192", "conf=0.001", "tracker=bytetrack"])
    assert len(tracked) == 2 and tracked[0].boxes is not None

    out = entrypoint(["export", "model=yolov8n.yaml", "format=onnx",
                      f"path={tmp_path / 'm'}", "imgsz=64"])
    assert Path(out).suffix == ".onnx" and Path(out).stat().st_size > 1000


def test_modes_list_matches_reference_modes():
    # reference entrypoint: TASKS x MODES + special; our single-task CLI
    # must at least cover the reference's mode verbs + specials
    for m in ("train", "val", "predict", "track", "export", "benchmark",
              "version", "checks", "settings", "cfg", "copy-cfg", "login", "logout"):
        assert m in MODES


def test_explorer_mode(tmp_path):
    from experiment_yolo_tpu.data import make_synthetic_dataset

    make_synthetic_dataset(tmp_path / "ds", n_train=6, n_val=2, imgsz=96)
    hits = entrypoint(["explorer", f"data={tmp_path / 'ds' / 'images' / 'train'}",
                       "model=yolov8n.yaml", "similar=0", "topk=3", "imgsz=96"])
    assert len(hits) == 3
    for j, s, f in hits:
        assert isinstance(j, int) and f.endswith(".jpg")
    with pytest.raises(SyntaxError, match="usage"):
        entrypoint(["explorer"])
