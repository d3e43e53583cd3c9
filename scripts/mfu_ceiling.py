"""FLOP-weighted MXU-utilization ceiling for a detection model.

The v5e MXU contracts 128x128 tiles: a conv with C_out < 128 can use at
most C_out/128 of the output lanes; the contraction dim K = C_in * k^2 is
likewise capped at K/128 when K < 128. This script walks every conv in a
jitted forward (from the jaxpr, so it sees exactly what runs), computes
each conv's FLOPs and its lane/contraction utilization bound, and reports
the FLOP-weighted ceiling — the best MFU ANY scheduler could reach.

Usage: python scripts/mfu_ceiling.py [cfg=yolov8n.yaml] [batch=128] [imgsz=640]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np


def walk(jaxpr, convs):
    for eq in jaxpr.eqns:
        if eq.primitive.name == "conv_general_dilated":
            lhs, rhs = eq.invars[0].aval, eq.invars[1].aval
            out = eq.outvars[0].aval
            dn = eq.params["dimension_numbers"]
            ci = rhs.shape[dn.rhs_spec[1]]
            co = rhs.shape[dn.rhs_spec[0]]
            ksp = [rhs.shape[i] for i in dn.rhs_spec[2:]]
            osp = [out.shape[i] for i in dn.out_spec[2:]]
            batch = out.shape[dn.out_spec[0]]
            groups = eq.params["feature_group_count"]
            flops = 2 * batch * int(np.prod(osp)) * co * ci * int(np.prod(ksp))
            k_contract = ci * int(np.prod(ksp))
            util = min(1.0, co / groups / 128.0) * min(1.0, k_contract / 128.0)
            convs.append((flops, util, f"ci{ci} co{co} k{ksp} g{groups} out{osp}"))
        for p in eq.params.values():
            if hasattr(p, "jaxpr"):
                walk(p.jaxpr, convs)
            if isinstance(p, (list, tuple)):
                for q in p:
                    if hasattr(q, "jaxpr"):
                        walk(q.jaxpr, convs)


def main(argv):
    kv = dict(a.partition("=")[::2] for a in argv)
    cfg = kv.get("cfg", "yolov8n.yaml")
    batch = int(kv.get("batch", 128))
    imgsz = int(kv.get("imgsz", 640))

    from experiment_yolo_tpu.nn.tasks import DetectionModel

    model = DetectionModel(cfg, dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.uint8)
    closed = jax.make_jaxpr(lambda xx: model.predict(v, xx.astype(jnp.float32) / 255.0))(x)
    convs = []
    walk(closed.jaxpr, convs)

    tot = sum(f for f, _, _ in convs)
    ceil = sum(f * u for f, u, _ in convs) / tot
    print(f"{cfg} batch={batch}: {len(convs)} convs, {tot/1e9:.1f} GFLOP forward")
    print(f"FLOP-weighted MXU utilization ceiling: {ceil:.1%}")
    worst = sorted(convs, key=lambda t: t[0] * (1 - t[1]), reverse=True)[:8]
    print("largest ceiling losses (flops x (1-util)):")
    for f, u, d in worst:
        print(f"  {f/1e9:7.2f} GFLOP  util<={u:5.1%}  {d}")


if __name__ == "__main__":
    main(sys.argv[1:])
