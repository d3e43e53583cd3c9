"""Dataset onboarding tooling: COCO converter, DOTA splitter, downloads,
check_cls_dataset (VERDICT r2 item 7)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

from experiment_yolo_tpu.data import (
    check_cls_dataset,
    coco80_to_coco91_class,
    coco91_to_coco80_class,
    convert_coco,
    convert_dota_to_yolo_obb,
)
from experiment_yolo_tpu.data.split_dota import bbox_iof, get_windows, split_trainval

REF = Path("/root/reference")


def test_coco_class_maps_match_reference():
    if not REF.exists():
        pytest.skip("reference not mounted")
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    from ultralytics.data.converter import coco80_to_coco91_class as ref80to91
    from ultralytics.data.converter import coco91_to_coco80_class as ref91to80

    assert coco91_to_coco80_class() == ref91to80()
    assert coco80_to_coco91_class() == ref80to91()


def _write_coco(tmp_path: Path, n_imgs=3):
    import cv2

    ann_dir = tmp_path / "annotations"
    img_dir = tmp_path / "images" / "train2017"
    ann_dir.mkdir(parents=True)
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(n_imgs):
        w, h = 320, 240
        name = f"{i:012d}.jpg"
        cv2.imwrite(str(img_dir / name), rng.randint(0, 255, (h, w, 3), np.uint8))
        images.append({"id": i, "file_name": name, "height": h, "width": w})
        for _ in range(3):
            x, y = rng.randint(0, w - 60), rng.randint(0, h - 60)
            bw, bh = rng.randint(20, 60), rng.randint(20, 60)
            annotations.append({
                "id": aid, "image_id": i, "category_id": int(rng.choice([1, 3, 18])),
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
                "segmentation": [[float(x), float(y), float(x + bw), float(y),
                                  float(x + bw), float(y + bh)]],
            })
            aid += 1
    # one crowd + one degenerate annotation: both must be skipped
    annotations.append({"id": aid, "image_id": 0, "category_id": 1,
                        "bbox": [5, 5, 10, 10], "area": 100, "iscrowd": 1})
    annotations.append({"id": aid + 1, "image_id": 0, "category_id": 1,
                        "bbox": [5, 5, 0, 10], "area": 0, "iscrowd": 0})
    cats = [{"id": c, "name": f"c{c}"} for c in (1, 3, 18)]
    (ann_dir / "instances_train2017.json").write_text(
        json.dumps({"images": images, "annotations": annotations, "categories": cats}))
    return ann_dir, img_dir


def test_convert_coco_boxes(tmp_path):
    ann_dir, img_dir = _write_coco(tmp_path)
    out = convert_coco(str(ann_dir), str(tmp_path / "conv"))
    labels = sorted((out / "labels" / "train2017").glob("*.txt"))
    assert len(labels) == 3
    rows = [ln.split() for ln in labels[0].read_text().splitlines()]
    assert len(rows) == 3  # crowd + degenerate skipped
    for r in rows:
        vals = [float(x) for x in r[1:]]
        assert all(0.0 <= v <= 1.0 for v in vals)
        # category 1 -> 0, 3 -> 2, 18 -> 16 under 91->80
        assert int(r[0]) in (0, 2, 16)


def test_convert_coco_matches_reference(tmp_path):
    if not REF.exists():
        pytest.skip("reference not mounted")
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    from ultralytics.data.converter import convert_coco as ref_convert

    ann_dir, _ = _write_coco(tmp_path)
    ours = convert_coco(str(ann_dir), str(tmp_path / "ours"), use_segments=True)
    import contextlib
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)  # the reference writes relative to cwd
    try:
        with contextlib.suppress(Exception):
            ref_convert(str(ann_dir), str(tmp_path / "ref"), use_segments=True)
    finally:
        os.chdir(cwd)
    ref_lbl = tmp_path / "ref" / "labels" / "train2017"
    if not ref_lbl.exists():
        pytest.skip("reference convert_coco could not run here")
    for f in sorted((ours / "labels" / "train2017").glob("*.txt")):
        ref_f = ref_lbl / f.name
        assert ref_f.exists()
        assert f.read_text() == ref_f.read_text(), f.name


def test_get_windows_matches_reference_geometry():
    # 1500x1800 image, 1024 crop / 200 gap: windows tile with the last
    # window snapped to the image edge
    wins = get_windows((1500, 1800), (1024,), (200,))
    assert wins.shape[1] == 4
    assert (wins[:, 2] <= 1800).all() and (wins[:, 3] <= 1500).all()
    assert (wins[:, 2] - wins[:, 0] == 1024).all()
    if REF.exists():
        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
        sys.path.insert(0, str(REF))
        try:
            from ultralytics.data.split_dota import get_windows as ref_windows
        except Exception:
            pytest.skip("reference split_dota needs shapely")
        np.testing.assert_array_equal(wins, ref_windows((1500, 1800), [1024], [200]))


def test_bbox_iof_axis_aligned():
    # axis-aligned quad fully inside the window -> IoF 1; half inside -> 0.5
    poly = np.array([[10, 10, 30, 10, 30, 30, 10, 30]], np.float32)
    wins = np.array([[0, 0, 40, 40], [20, 0, 60, 40], [100, 100, 140, 140]], np.float32)
    iof = bbox_iof(poly, wins)
    np.testing.assert_allclose(iof[0], [1.0, 0.5, 0.0], atol=1e-6)
    # rotated quad (diamond) vs covering window
    diamond = np.array([[20, 10, 30, 20, 20, 30, 10, 20]], np.float32)
    iof2 = bbox_iof(diamond, np.array([[0, 0, 40, 40]], np.float32))
    np.testing.assert_allclose(iof2[0], [1.0], atol=1e-6)


def test_split_dota_end_to_end(tmp_path):
    import cv2

    root = tmp_path / "DOTA"
    for phase in ("train", "val"):
        (root / "images" / phase).mkdir(parents=True)
        (root / "labels" / f"{phase}_original").mkdir(parents=True)
        img = np.random.RandomState(0).randint(0, 255, (700, 900, 3), np.uint8)
        cv2.imwrite(str(root / "images" / phase / "P0001.png"), img)
        (root / "labels" / f"{phase}_original" / "P0001.txt").write_text(
            "100 100 200 100 200 200 100 200 plane 0\n"
            "700 500 800 500 800 600 700 600 ship 0\n")
    convert_dota_to_yolo_obb(str(root))
    lbl = (root / "labels" / "train" / "P0001.txt").read_text().splitlines()
    assert len(lbl) == 2 and lbl[0].startswith("0 ") and lbl[1].startswith("1 ")

    split_trainval(str(root), str(tmp_path / "split"), crop_size=512, gap=100)
    out_imgs = list((tmp_path / "split" / "images" / "train").glob("*.jpg"))
    out_lbls = list((tmp_path / "split" / "labels" / "train").glob("*.txt"))
    assert len(out_imgs) >= 4
    assert out_lbls, "no window captured any object"
    for f in out_lbls:
        for row in f.read_text().splitlines():
            vals = [float(v) for v in row.split()[1:]]
            assert all(-0.01 <= v <= 1.01 for v in vals)


def test_downloads_file_url_and_zip(tmp_path):
    from experiment_yolo_tpu.utils.downloads import is_url, safe_download, unzip_file, zip_directory

    src = tmp_path / "payload"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("hello")
    (src / "sub" / "b.txt").write_text("world")
    zf = zip_directory(src)
    assert zf.exists() and zf.suffix == ".zip"

    assert is_url("https://example.com/x.zip")
    assert is_url(zf.as_uri())
    assert not is_url("not a url")

    out = safe_download(zf.as_uri(), dir=tmp_path / "dl", unzip=True)
    assert (Path(out) / "a.txt").read_text() == "hello" or (Path(out) / "payload" / "a.txt").exists()

    out2 = unzip_file(zf, path=tmp_path / "unz")
    assert any(Path(out2).rglob("b.txt"))


def test_safe_download_retries_then_raises(tmp_path):
    from experiment_yolo_tpu.utils.downloads import safe_download

    with pytest.raises(ConnectionError):
        safe_download((tmp_path / "missing.zip").as_uri(), dir=tmp_path, retry=1)


def test_check_cls_dataset(tmp_path):
    import cv2

    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        for cls in ("cat", "dog"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            cv2.imwrite(str(d / "0.jpg"), rng.randint(0, 255, (32, 32, 3), np.uint8))
    data = check_cls_dataset(tmp_path)
    assert data["nc"] == 2
    assert data["names"] == {0: "cat", 1: "dog"}
    assert data["train"].exists() and data["val"].exists()
    with pytest.raises(FileNotFoundError):
        check_cls_dataset(tmp_path / "nope")


def test_unzip_single_toplevel_dir_without_dir_entries(tmp_path):
    """Regression: a zip whose only names are nested files (no explicit dir
    entries) has ONE top-level dir and must extract to path/<dir>, not into
    an extra <stem>/ level."""
    import zipfile

    from experiment_yolo_tpu.utils.downloads import unzip_file

    zf = tmp_path / "data.zip"
    with zipfile.ZipFile(zf, "w") as z:
        z.writestr("foo/a.txt", "a")
        z.writestr("foo/b/c.txt", "c")
    out = unzip_file(zf, path=tmp_path / "unz")
    assert out == tmp_path / "unz" / "foo"
    assert (out / "a.txt").read_text() == "a"
    # loose root files still wrap into <stem>/
    zf2 = tmp_path / "loose.zip"
    with zipfile.ZipFile(zf2, "w") as z:
        z.writestr("a.txt", "a")
        z.writestr("foo/b.txt", "b")
    out2 = unzip_file(zf2, path=tmp_path / "unz2")
    assert out2 == tmp_path / "unz2" / "loose"
    assert (out2 / "a.txt").exists() and (out2 / "foo" / "b.txt").exists()


def test_convert_coco_partial_segmentation_stays_aligned(tmp_path):
    """Regression: an annotation without 'segmentation' must not shift later
    polygons onto the wrong bbox row."""
    import json

    from experiment_yolo_tpu.data.converter import convert_coco

    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    data = {
        "images": [{"id": 1, "height": 100, "width": 100, "file_name": "im.jpg"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20]},  # no segmentation
            {"id": 2, "image_id": 1, "category_id": 2,
             "bbox": [50, 50, 20, 20],
             "segmentation": [[50, 50, 70, 50, 70, 70, 50, 70]]},
        ],
    }
    (ann_dir / "instances_val.json").write_text(json.dumps(data))
    out = convert_coco(str(ann_dir), save_dir=str(tmp_path / "conv"), use_segments=True)
    lines = (out / "labels" / "val" / "im.txt").read_text().strip().splitlines()
    assert len(lines) == 2
    # row 0: plain bbox (5 fields, cls 0); row 1: polygon (9 fields, cls 1)
    assert len(lines[0].split()) == 5 and lines[0].split()[0] == "0"
    assert len(lines[1].split()) == 9 and lines[1].split()[0] == "1"
