"""Dataset Explorer: embeddings + similarity + label queries
(reference ultralytics/data/explorer)."""

from pathlib import Path

import jax
import numpy as np
import pytest

from experiment_yolo_tpu.data import make_synthetic_dataset
from experiment_yolo_tpu.data.explorer import Explorer
from experiment_yolo_tpu.nn.tasks import DetectionModel

TINY = str(Path(__file__).parent / "assets" / "tiny.yaml")


@pytest.fixture(scope="module")
def explorer(tmp_path_factory):
    root = tmp_path_factory.mktemp("explorer")
    yaml = make_synthetic_dataset(root, n_train=10, n_val=2, imgsz=96)
    model = DetectionModel(TINY)
    variables = model.init(jax.random.PRNGKey(0))
    ex = Explorer(yaml.parent / "images" / "train", model, variables, imgsz=96, batch=4)
    ex.build()
    return ex


def test_embeddings_and_similarity(explorer):
    assert explorer.embeddings.shape[0] == 10
    np.testing.assert_allclose(np.linalg.norm(explorer.embeddings, axis=1), 1.0, atol=1e-4)
    sims = explorer.similar(0, topk=3)
    assert len(sims) == 3 and all(j != 0 for j, _, _ in sims)
    # self-query via image returns itself first
    import cv2
    img = cv2.imread(explorer.dataset.im_files[4])
    hits = explorer.similar_to_image(img, topk=2)
    assert hits[0][0] == 4


def test_query_and_counts(explorer):
    counts = explorer.class_counts()
    assert sum(counts.values()) > 0
    circles = explorer.query(lambda r: (r["cls"] == 0).any())
    assert all(isinstance(i, int) for i in circles)
    big = explorer.query(lambda r: (r["bboxes_n"][:, 2] > 0.5).any() if len(r["cls"]) else False)
    assert isinstance(big, list)


def test_sql_where_engine():
    """parse_sql_where covers the reference's duckdb WHERE grammar
    (reference explorer.py:172-216)."""
    from experiment_yolo_tpu.data.explorer import parse_sql_where

    rec = {"im_file": "/ds/img_003.jpg", "labels": ["circle", "square"],
           "cls": [0, 1], "bboxes": [[0.5, 0.5, 0.2, 0.3], [0.1, 0.2, 0.05, 0.05]],
           "n_labels": 2}
    assert parse_sql_where("labels LIKE '%circle%'")(rec)
    assert not parse_sql_where("labels LIKE '%person%'")(rec)
    assert parse_sql_where("cls = 1")(rec)                      # any-element
    assert not parse_sql_where("cls = 7")(rec)
    assert parse_sql_where("n_labels >= 2 AND cls IN (0, 5)")(rec)
    assert parse_sql_where("n_labels > 5 OR im_file LIKE '%img_00_%'")(rec)
    assert parse_sql_where("NOT (cls = 7)")(rec)
    assert parse_sql_where("cls NOT IN (7, 8)")(rec)
    assert parse_sql_where("n_labels BETWEEN 1 AND 3")(rec)
    assert parse_sql_where("labels IS NOT NULL")(rec)
    assert not parse_sql_where("labels IS NULL")(rec)
    assert parse_sql_where("im_file != 'x'")(rec)
    import pytest as _p
    with _p.raises(ValueError):
        parse_sql_where("cls = = 1")
    with _p.raises(KeyError):
        parse_sql_where("nope = 1")(rec)


def test_sql_query_and_plot(explorer, tmp_path):
    """sql_query accepts full SELECT or bare WHERE (reference
    explorer.py:204-209) and plot_sql_query renders a mosaic."""
    all_rows = explorer.sql_query("WHERE n_labels >= 0")
    assert len(all_rows) == 10
    sel = explorer.sql_query("SELECT * FROM 'table' WHERE cls = 0")
    assert all(0 in r["cls"] for r in sel)
    assert set(sel[0]) >= {"idx", "im_file", "labels", "cls", "bboxes", "n_labels"}
    with pytest.raises(ValueError, match="SELECT or WHERE"):
        explorer.sql_query("DROP TABLE students")
    out = tmp_path / "q.jpg"
    img = explorer.plot_sql_query("WHERE n_labels >= 1", save_path=out)
    assert img is not None and img.ndim == 3 and out.exists()
    assert explorer.plot_sql_query("WHERE n_labels > 99") is None
