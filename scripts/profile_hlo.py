"""Bucket the compiled train-step HLO by XLA's own cost model.

Per-op wall timings through the relay are dispatch-noise-dominated
(docs/KERNELS.md "measurement methodology"); the trustworthy per-op
attribution is XLA's backend_config cost estimate on each top-level
instruction of the optimized HLO. This script compiles ONE production
train step (same construction as bench.bench_train_step), walks the
optimized module, and buckets estimated cycles/cost by what each fusion
actually contains (conv fwd/bwd, copies/transposes, batch-norm chains,
gather/scatter, reductions, elementwise).

Usage:
  python scripts/profile_hlo.py [cfg=yolov8-ASF-P2P2.yaml] [batch=128]
                                [remat=<int|0|false>] [top=25] [mode=train|infer]
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np


def build_train_step(cfg: str, batch: int, imgsz: int = 640, **overrides):
    from experiment_yolo_tpu.engine.trainer import DetectionTrainer, TrainState
    from experiment_yolo_tpu.nn.tasks import DetectionModel
    from experiment_yolo_tpu.optim.builders import build_optimizer

    model = DetectionModel(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    trainer = DetectionTrainer(model=model, variables=variables,
                               overrides={"amp": True, "batch": batch, "imgsz": imgsz,
                                          **overrides})
    trainer.tx = build_optimizer(
        variables["params"], "SGD", 0.01, 0.937, 5e-4, nb=100, epochs=100, lrf=0.01,
        cos_lr=False, warmup_epochs=3.0, warmup_bias_lr=0.1, warmup_momentum=0.8,
    )
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=trainer.tx.init(variables["params"]),
        ema_params=jax.tree.map(jnp.copy, variables["params"]),
        ema_batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
        iou_mean=jnp.asarray(1.0, jnp.float32),
        step=jnp.zeros([], jnp.int32),
        ema_updates=jnp.zeros([], jnp.int32),
    )
    rng = np.random.RandomState(0)
    nl = 16
    batch_np = {
        "img": jnp.asarray(rng.randint(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8)),
        "bboxes": jnp.asarray(rng.uniform(0.2, 0.6, (batch, nl, 4)).astype(np.float32)),
        "cls": jnp.asarray(rng.randint(0, model.nc, (batch, nl)), jnp.int32),
        "mask": jnp.asarray(np.tile(np.arange(nl) < 6, (batch, 1))),
    }
    step = jax.jit(trainer._make_train_step())
    return step, state, batch_np, model, variables


_COMP_RE = re.compile(r"^(?:%|ENTRY %?)?([\w.\-]+)\s+(?:\([^)]*\)\s*->|\{)")
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")
_FUSION_KIND_RE = re.compile(r"kind=k(\w+)")


_INSTR_RE = re.compile(r"^(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)$")
_OPCODE_RE = re.compile(r"\b([a-z][\w\-]*)\(")


def parse_hlo(text: str):
    """Return (comp_ops, instrs): comp_ops maps computation name -> list of
    opcodes inside; instrs is one dict per instruction (any computation).
    Opcode = first lowercase word followed by '(' after the '=' (layout
    tuples like T(8,128) are uppercase and skipped)."""
    comp_ops: dict[str, list[str]] = {}
    cur = None
    instrs = []
    for line in text.splitlines():
        s = line.strip()
        if not s:
            continue
        if s.endswith("{") and "=" not in s.split("{", 1)[0]:
            m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)", s)
            cur = m.group(1) if m else None
            if cur:
                comp_ops[cur] = []
            continue
        if s.startswith("}"):
            cur = None
            continue
        m = _INSTR_RE.match(s)
        if not m:
            continue
        name, rhs = m.group(1), m.group(2)
        om = _OPCODE_RE.search(rhs)
        if not om:
            continue
        opcode = om.group(1)
        if cur:
            comp_ops[cur].append(opcode)
        instrs.append({"comp": cur, "name": name, "opcode": opcode, "line": s})
    return comp_ops, instrs


def classify(instr, comp_ops) -> str:
    op = instr["opcode"]
    line = instr["line"]
    inner: list[str] = []
    if op == "fusion":
        m = _CALLS_RE.search(line)
        if m and m.group(1) in comp_ops:
            inner = comp_ops[m.group(1)]
    ops = set(inner) | {op}
    if "convolution" in ops:
        return "conv"
    if op in ("copy", "copy-start", "copy-done", "transpose", "bitcast") or (
            "transpose" in ops and not ops & {"dot", "reduce"}):
        return "copy/transpose"
    if "scatter" in ops:
        return "scatter"
    if "gather" in ops:
        return "gather"
    if "dot" in ops:
        return "dot"
    if "sort" in ops:
        return "sort"
    if "reduce" in ops or "reduce-window" in ops:
        return "reduce(+elemwise)"
    if op in ("all-reduce", "all-gather", "reduce-scatter", "collective-permute"):
        return "collective"
    return "elementwise/other"


def main(argv):
    kv = dict(a.partition("=")[::2] for a in argv)
    cfg = kv.get("cfg", "yolov8-ASF-P2P2.yaml")
    batch = int(kv.get("batch", 128))
    top = int(kv.get("top", 25))
    mode = kv.get("mode", "train")
    overrides = {}
    if "remat" in kv:
        r = kv["remat"]
        overrides["remat"] = False if r in ("false", "0") else int(r)

    if mode == "train":
        step, state, batch_np, _, _ = build_train_step(cfg, batch, **overrides)
        lowered = step.lower(state, batch_np)
    else:
        from experiment_yolo_tpu.nn.tasks import DetectionModel
        model = DetectionModel(cfg, dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0))
        x = jnp.zeros((batch, 640, 640, 3), jnp.float32)
        lowered = jax.jit(lambda v, xx: model.predict(v, xx)).lower(variables, x)

    compiled = lowered.compile()
    text = compiled.as_text()
    print(f"optimized HLO: {len(text.splitlines())} lines", file=sys.stderr)
    if "dump" in kv:
        Path(kv["dump"]).write_text(text)
        print(f"dumped to {kv['dump']}", file=sys.stderr)

    # TPU backend_configs carry '"estimated_cycles":"N"' on instructions the
    # cost model scheduled (convs, windowed fusions, reduces). Elementwise
    # fusions without the annotation are invisible here — treat the buckets
    # as a lower bound and cross-check against wall time.
    cost_re = re.compile(r'"estimated_cycles":"([\d.e+]+)"')
    comp_ops, instrs = parse_hlo(text)
    buckets = defaultdict(float)
    rows = []
    for ins in instrs:
        m = cost_re.search(ins["line"])
        if not m:
            continue
        c = float(m.group(1))
        k = classify(ins, comp_ops)
        buckets[k] += c
        rows.append((c, k, ins["name"], ins["line"][:140]))

    total = sum(buckets.values())
    if not total:
        print("no cost annotations found in HLO; dumping opcode histogram instead")
        hist = defaultdict(int)
        for ins in instrs:
            hist[classify(ins, comp_ops)] += 1
        for k, v in sorted(hist.items(), key=lambda x: -x[1]):
            print(f"{k:24s} {v}")
        return

    print(f"\n== cost buckets ({cfg} batch={batch} mode={mode} overrides={overrides}) ==")
    for k, v in sorted(buckets.items(), key=lambda x: -x[1]):
        print(f"{k:24s} {v:14.3e}  {100 * v / total:5.1f}%")
    print(f"\n== top {top} instructions ==")
    for c, k, name, line in sorted(rows, reverse=True)[:top]:
        print(f"{c:12.3e} {k:18s} {name[:60]}")
        print(f"             {line[:200]}")


if __name__ == "__main__":
    main(sys.argv[1:])
