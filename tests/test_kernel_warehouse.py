"""Kernel Warehouse: shared cell warehouses + temperature-annealed mixture
(reference extra_modules/kernel_warehouse.py; tasks.py:283-301;
trainer.py:795-797)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.nn.kernel_warehouse import (
    C2fKW,
    C3KW,
    KWManager,
    get_temperature,
)

REF = Path("/root/reference")

KW_YAML = """
nc: 2
Warehouse_Manager: True
Warehouse_Manager_Ratio: 1.0
backbone:
  - [-1, 1, Conv, [32, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]
  - [-1, 1, C2f_KW, [64, 'c2f_kw1']]
  - [-1, 1, Conv, [64, 3, 2]]
  - [-1, 1, C3_KW, [64, 'c3_kw1']]
  - [-1, 1, KWConv, [64, 'kwc1', 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]
head:
  - [[4, 5, 6], 1, Detect, [nc]]
"""


def _build(tmp_path):
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    yaml = tmp_path / "kw.yaml"
    yaml.write_text(KW_YAML)
    return DetectionModel(str(yaml))


def test_kw_model_builds_and_runs(tmp_path):
    m = _build(tmp_path)
    assert m.kw_manager is not None and len(m.kw_manager.cell_shapes) == 5
    v = m.init(jax.random.PRNGKey(0))
    assert [k for k in v["params"] if k.startswith("kw_warehouse_")]
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3))
    boxes, scores = m.predict(v, x)
    assert scores.shape[-1] == 2

    # the temperature changes the mixture: temp=1 pins the static one-hot
    o0 = m.apply(v, x, False, kw_temp=0.0)
    o1 = m.apply(v, x, False, kw_temp=1.0)
    d = max(float(jnp.abs(a - b).max()) for a, b in zip(o0, o1))
    assert d > 1e-6

    # gradients flow into the shared warehouse cells
    def loss(params):
        out = m.apply({**v, "params": params}, x, False, kw_temp=0.5)
        return sum(o.sum() for o in out)

    g = jax.grad(loss)(v["params"])
    gw = sum(float(jnp.abs(g[k]).sum()) for k in g if k.startswith("kw_warehouse_"))
    assert np.isfinite(gw) and gw > 0


def test_kw_temperature_schedule():
    # linear decay 1.0 -> 0 over temp_epoch epochs (kernel_warehouse.py:345)
    t0 = get_temperature(1, 0, 100, temp_epoch=20, temp_init_value=1.0)
    t_mid = get_temperature(0, 10, 100, temp_epoch=20, temp_init_value=1.0)
    t_end = get_temperature(0, 20, 100, temp_epoch=20, temp_init_value=1.0)
    assert t0 > 0.99 and abs(t_mid - 0.5) < 1e-6 and t_end == 0.0


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
@pytest.mark.parametrize("name,n", [("C2f_KW", 1), ("C2f_KW", 2), ("C3_KW", 1), ("C3_KW", 2)])
def test_kw_param_parity(name, n):
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import importlib

    import torch.nn as tnn

    block = importlib.import_module("ultralytics.nn.extra_modules.block")
    kwm = importlib.import_module("ultralytics.nn.extra_modules.kernel_warehouse")
    wm = kwm.Warehouse_Manager(cell_num_ratio=1.0)
    tb = getattr(block, name)(64, 64, n, wm, "t")
    wm.store()
    wm.allocate(tnn.Sequential(tb))
    t = sum(p.numel() for p in tb.parameters()) + sum(p.numel() for p in wm.weights.parameters())

    mgr = KWManager(cell_num_ratio=1.0)
    k0 = 3 if name == "C2f_KW" else 1
    plans = tuple((mgr.reserve(32, 32, k0, 1, "t_cv1"), mgr.reserve(32, 32, 3, 1, "t_cv2"))
                  for _ in range(n))
    mgr.store()
    cls = C2fKW if name == "C2f_KW" else C3KW
    m = cls(64, plans=plans)
    wh = [jnp.zeros(s[:3]) for s in mgr.cell_shapes]
    v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 64)), False,
                                      warehouse=wh, kw_temp=0.0))
    o = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    o += sum(int(np.prod(s[:3])) for s in mgr.cell_shapes)
    assert o == t, f"{name} n={n}: ours {o:,} vs reference {t:,}"


def test_kw_training_smoke(tmp_path, tmp_path_factory):
    """End-to-end: a KW model trains one epoch through DetectionTrainer —
    the temperature-annealed step path (reference trainer.py:795-797)."""
    from experiment_yolo_tpu.data import make_synthetic_dataset
    from experiment_yolo_tpu.engine.trainer import DetectionTrainer
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    data = make_synthetic_dataset(tmp_path_factory.mktemp("kwsynth"), n_train=8, n_val=4, imgsz=128)
    yaml = tmp_path / "kw-tiny.yaml"
    yaml.write_text(KW_YAML)
    model = DetectionModel(str(yaml), nc=3)
    variables = model.init(jax.random.PRNGKey(0))
    trainer = DetectionTrainer(
        model=model,
        variables=variables,
        overrides={
            "data": str(data), "epochs": 1, "batch": 8, "imgsz": 128, "workers": 0,
            "optimizer": "SGD", "lr0": 0.01, "warmup_epochs": 0.0, "val": False,
            "save": False, "amp": False, "max_labels": 16, "plots": False, "n_devices": 1,
            "project": str(tmp_path), "name": "kwtrain",
        },
    )
    results = trainer.train()
    assert results["epochs_run"] == 1
    vals = [v for v in trainer.loss_items.values()]
    assert all(np.isfinite(v) for v in vals)
