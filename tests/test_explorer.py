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
