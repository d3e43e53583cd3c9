"""Classification task family tests: dataset, model, training convergence."""

from pathlib import Path

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.models.classify import (
    ClassificationDataset,
    ClassificationModel,
    train_classifier,
    validate_classifier,
)

TINY = str(Path(__file__).parent / "assets" / "tiny.yaml")


@pytest.fixture(scope="module")
def cls_data(tmp_path_factory):
    """Two trivially separable classes: red images vs blue images."""
    root = tmp_path_factory.mktemp("clsdata")
    rng = np.random.default_rng(0)
    for split, n in (("train", 16), ("val", 8)):
        for ci, color in enumerate(((40, 40, 220), (220, 40, 40))):  # BGR red / blue
            d = root / split / f"class{ci}"
            d.mkdir(parents=True)
            for i in range(n):
                img = np.full((64, 64, 3), color, np.uint8)
                img = np.clip(img.astype(int) + rng.integers(-30, 30, img.shape), 0, 255).astype(np.uint8)
                cv2.imwrite(str(d / f"{i}.jpg"), img)
    return root


def test_dataset_scan(cls_data):
    ds = ClassificationDataset(cls_data / "train", imgsz=64)
    assert len(ds) == 32
    assert ds.names == {0: "class0", 1: "class1"}
    img, label = ds.get(0)
    assert img.shape == (64, 64, 3) and label in (0, 1)


def test_model_forward_softmax(cls_data):
    m = ClassificationModel(TINY, nc=2)
    v = m.init(jax.random.PRNGKey(0))
    probs = m.predict(v, jnp.zeros((2, 64, 64, 3)))
    assert probs.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_training_converges_on_separable_classes(cls_data):
    m = ClassificationModel(TINY, nc=2)
    # BN running stats (momentum 0.97) need ~50+ updates before eval-mode
    # stats match train-mode; 30 epochs x 2 batches gives 60
    metrics = train_classifier(m, cls_data, epochs=30, batch=16, imgsz=64, lr0=0.003)
    assert metrics["top1"] >= 0.9, f"classifier failed to separate colors: {metrics}"
