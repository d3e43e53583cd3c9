"""Model-build golden tests: param counts, strides, output shapes.

Golden parameter counts were verified parameter-exact against the PyTorch
reference (fork of Ultralytics 8.1.9) built on CPU via tools/refstub —
see SURVEY.md §6 for the published numbers they correspond to.
"""

import jax
import jax.numpy as jnp
import pytest

from experiment_yolo_tpu.nn.tasks import DetectionModel

# (config, golden trainable-param count from the torch reference, strides)
GOLDEN = [
    ("yolov8n.yaml", 3157184, (8, 16, 32)),  # reference yaml header: 3157200 incl. 16 fixed DFL weights
    ("yolov8-LD-P2.yaml", 918288, (4, 8, 16)),  # paper "0.914M" DEAL-YOLO-LD
    ("yolov8-ASF-P2P2.yaml", 997186, (4, 8, 16)),  # paper "0.994M" DEAL-YOLO
    ("yolov8-ASF-P2.yaml", 2495432, (4, 8, 16, 32)),
    ("yolov8-p2.yaml", 3354128, (4, 8, 16, 32)),
    ("yolov8-ASF.yaml", 3197312, (8, 16, 32)),
]


@pytest.mark.parametrize("cfg,n_params,strides", GOLDEN)
def test_param_count_and_strides(cfg, n_params, strides):
    m = DetectionModel(cfg)
    assert m.strides == strides
    assert m.num_params_static() == n_params  # eval_shape: no compile needed


def test_forward_shapes_stats_and_priors():
    """One real init+forward exercise (compiles once; other checks piggyback)."""
    m = DetectionModel("yolov8n.yaml", nc=80)
    v = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 160, 160, 3))
    outs = m.apply(v, x)
    assert [o.shape for o in outs] == [
        (2, 20, 20, 144),
        (2, 10, 10, 144),
        (2, 5, 5, 144),
    ]

    # train mode must update running BN stats
    _, updates = m.apply(v, x, train=True, mutable=["batch_stats"])
    old = jax.tree.leaves(v["batch_stats"])[0]
    new = jax.tree.leaves(updates["batch_stats"])[0]
    assert not jnp.allclose(old, new)

    # Detect bias priors (reference head.py:bias_init)
    import math

    head = v["params"][f"layers_{m.detect_idx}"]
    assert jnp.allclose(head["cv2_0_2"]["bias"], 1.0)
    want = math.log(5 / 80 / (640 / 8) ** 2)
    assert jnp.allclose(head["cv3_0_2"]["bias"], want)


def test_non_stride_multiple_input_raises_clearly():
    """Library-layer guard: bad imgsz must not surface as a Concat error."""
    m = DetectionModel("yolov8n.yaml", nc=2)
    v = m.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 100, 100, 3))
    with pytest.raises(ValueError, match="divisible by the model's max stride 32"):
        m.apply(v, x)
    with pytest.raises(ValueError, match="128x128"):
        m.predict(v, x)


def test_unbatched_input_raises_clearly():
    """Rank guard: an (H,W,C) input must flag the missing batch dim, not
    misread W/C as the spatial dims (ADVICE r3)."""
    m = DetectionModel("yolov8n.yaml", nc=2)
    v = m.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="rank 3.*batch dim"):
        m.apply(v, jnp.zeros((128, 128, 3)))


def test_silence_block_builds_and_passes_through():
    """v9-style Silence input anchor: builds from a dict config and is an
    exact pass-through for channels and values (reference v9 yamls use it
    as layer 0)."""
    cfg = {
        "nc": 2,
        "backbone": [
            [-1, 1, "Silence", []],
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
        ],
        "head": [[[1, 2, 3], 1, "Detect", ["nc"]]],
    }
    m = DetectionModel(cfg)
    assert m.strides == (2, 4, 8)
    v = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    outs = m.apply(v, x)
    assert [o.shape for o in outs] == [(1, 32, 32, 66), (1, 16, 16, 66), (1, 8, 8, 66)]
    # Silence itself is identity: channel bookkeeping recorded c2 == c1
    from experiment_yolo_tpu.nn.modules import Silence

    s = Silence()
    y = s.apply({}, x)
    assert (y == x).all()
