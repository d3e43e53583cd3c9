"""FLOP-weighted MXU-utilization ceiling + gather roofline for a model.

The v5e MXU contracts 128x128 tiles: a conv with C_out < 128 can use at
most C_out/128 of the output lanes; the contraction dim K = C_in * k^2 is
likewise capped at K/128 when K < 128. This script walks every conv AND
dot_general (the LDConv projection is a dense matmul) in a jitted forward
(from the jaxpr, so it sees exactly what runs — including inside scan
bodies, scaled by the trip count), computes per-op FLOPs and the
lane/contraction utilization bound, and reports the FLOP-weighted ceiling
— the best MFU ANY scheduler could reach.

For LDConv configs it also accounts the non-MXU gather work: each lax.gather
moves output-bytes x lane-padding (a minor dim m pads to the 128-lane tile,
so padded bytes = bytes x 128/m when m < 128). Those bytes ride HBM, not
the MXU, so the throughput ceiling combines both rooflines:
  t_img >= flops/(PEAK_FLOPS x ceiling) + gather_bytes/PEAK_BW.

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

PEAK_FLOPS = 197e12  # v5e bf16
PEAK_BW = 819e9      # v5e HBM bytes/s


def _lane_pad_bytes(aval):
    """Padded HBM bytes of an array: minor dim pads to the 128-lane tile."""
    if not aval.shape:
        return aval.dtype.itemsize
    minor = aval.shape[-1]
    pad = max(minor, 128 if len(aval.shape) > 1 else minor) / max(minor, 1)
    return int(np.prod(aval.shape)) * aval.dtype.itemsize * pad


def walk(jaxpr, convs, gathers, mult=1):
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
            flops = mult * 2 * batch * int(np.prod(osp)) * co * ci * int(np.prod(ksp))
            k_contract = ci * int(np.prod(ksp))
            util = min(1.0, co / groups / 128.0) * min(1.0, k_contract / 128.0)
            convs.append((flops, util, f"ci{ci} co{co} k{ksp} g{groups} out{osp}"))
        elif eq.primitive.name == "dot_general":
            lhs, rhs = eq.invars[0].aval, eq.invars[1].aval
            out = eq.outvars[0].aval
            (lc, rc), _ = eq.params["dimension_numbers"]
            k = int(np.prod([lhs.shape[i] for i in lc]))
            m = int(np.prod(out.shape)) // max(out.shape[-1], 1)
            n = out.shape[-1] if out.shape else 1
            flops = mult * 2 * m * n * k
            util = min(1.0, n / 128.0) * min(1.0, k / 128.0)
            convs.append((flops, util, f"dot m{m} n{n} k{k}"))
        elif eq.primitive.name in ("gather", "scatter-add", "scatter_add"):
            out = eq.outvars[0].aval
            gathers.append((mult * _lane_pad_bytes(out),
                            f"{eq.primitive.name} out{out.shape} {out.dtype}"))
        for p in eq.params.values():
            sub_mult = mult
            if eq.primitive.name == "scan" and hasattr(p, "jaxpr"):
                sub_mult = mult * eq.params.get("length", 1)
            if hasattr(p, "jaxpr"):
                walk(p.jaxpr, convs, gathers, sub_mult)
            if isinstance(p, (list, tuple)):
                for q in p:
                    if hasattr(q, "jaxpr"):
                        walk(q.jaxpr, convs, gathers, sub_mult)


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
    convs, gathers = [], []
    walk(closed.jaxpr, convs, gathers)

    tot = sum(f for f, _, _ in convs)
    ceil = sum(f * u for f, u, _ in convs) / tot
    print(f"{cfg} batch={batch}: {len(convs)} MXU ops, {tot/1e9:.1f} GFLOP forward")
    print(f"FLOP-weighted MXU utilization ceiling: {ceil:.1%}")
    worst = sorted(convs, key=lambda t: t[0] * (1 - t[1]), reverse=True)[:8]
    print("largest ceiling losses (flops x (1-util)):")
    for f, u, d in worst:
        print(f"  {f/1e9:7.2f} GFLOP  util<={u:5.1%}  {d}")

    gbytes = sum(b for b, _ in gathers)
    t_mxu = tot / (PEAK_FLOPS * ceil)
    if gbytes:
        t_gather = gbytes / PEAK_BW
        print(f"\ngather/scatter traffic: {gbytes/1e9:.2f} GB padded "
              f"({len(gathers)} ops); largest:")
        for b, d in sorted(gathers, reverse=True)[:5]:
            print(f"  {b/1e9:7.2f} GB  {d}")
        print(f"roofline per batch: MXU {t_mxu*1e3:.1f} ms + gather HBM "
              f"{t_gather*1e3:.1f} ms -> ceiling "
              f"{batch/(t_mxu+t_gather):,.0f} img/s "
              f"(MXU-only would be {batch/t_mxu:,.0f})")
    else:
        print(f"roofline per batch: MXU {t_mxu*1e3:.1f} ms -> ceiling "
              f"{batch/t_mxu:,.0f} img/s")


if __name__ == "__main__":
    main(sys.argv[1:])
