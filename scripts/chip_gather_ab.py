"""Chip A/B: which gather formulations vectorize on TPU (vs while-loop)?

Writes results incrementally to stdout (run with python -u or flush=True)
so a timeout preserves partial results. Each case reports the compiled
HLO's while/dynamic-slice counts and a 10-iter mean execution time.

Usage: python scripts/chip_gather_ab.py [cases=A,B,C,D,E] [q=76800]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def report(name, fn, *a):
    try:
        j = jax.jit(fn)
        t0 = time.perf_counter()
        compiled = j.lower(*a).compile()
        tc = time.perf_counter() - t0
        txt = compiled.as_text()
        nwhile = txt.count("while(")
        ndyn = txt.count("dynamic-slice(")
        r = j(*a)
        jax.device_get(r)
        t0 = time.perf_counter()
        for _ in range(10):
            r = j(*a)
        jax.device_get(r)
        dt = (time.perf_counter() - t0) / 10
        print(f"{name:36s} while={nwhile} dynslice={ndyn} compile={tc:5.1f}s "
              f"exec={dt*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:36s} FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


def main(argv):
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    cases = kv.get("cases", "A,B,C,D,E").split(",")
    Q = int(kv.get("q", 76800))

    print(f"devices: {jax.devices()}", flush=True)
    H, W, C = 161, 161, 16
    S = H * W
    key = jax.random.PRNGKey(0)
    x2 = jax.random.normal(key, (S, C), jnp.bfloat16)
    idx = jax.random.randint(key, (Q,), 0, S, jnp.int32)

    if "A" in cases:
        report(f"A take rows (S,{C}) Q={Q}",
               lambda x, i: jnp.take(x, i, axis=0).sum(), x2, idx)
    if "B" in cases:
        x128 = jax.random.normal(key, (S, 128), jnp.bfloat16)
        report(f"B take rows (S,128) Q={Q}",
               lambda x, i: jnp.take(x, i, axis=0).sum(), x128, idx)
    if "C" in cases:
        xf = x2.reshape(-1)
        idxf = jax.random.randint(key, (Q,), 0, S * C, jnp.int32)
        report(f"C flat 1-D take Q={Q}",
               lambda x, i: jnp.take(x, i, axis=0).sum(), xf, idxf)
    if "D" in cases:
        idx2 = jax.random.randint(key, (Q, 1), 0, S, jnp.int32)
        report(f"D take_along_axis axis0 (S,{C})",
               lambda x, i: jnp.take_along_axis(
                   x, jnp.broadcast_to(i, (i.shape[0], x.shape[1])), axis=0
               ).sum(), x2, idx2)
    if "E" in cases:
        Qb = 4096
        idxb = idx[:Qb]

        def onehot_mm(x, i):
            oh = (i[:, None] == jnp.arange(x.shape[0])[None, :]).astype(jnp.bfloat16)
            return (oh @ x).sum()

        report(f"E one-hot matmul Q={Qb} S={S}", onehot_mm, x2, idxb)
    if "F" in cases:
        upd = jax.random.normal(key, (Q, C), jnp.bfloat16)

        def row_scatter(i, u):
            dn = jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,), inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,),
            )
            z = jnp.zeros((S, C), jnp.bfloat16)
            return jax.lax.scatter_add(
                z, i[:, None], u, dn,
                mode=jax.lax.GatherScatterMode.CLIP,
            ).sum()

        report(f"F row scatter-add (S,{C}) Q={Q}", row_scatter, idx, upd)
    if "G" in cases:
        def pair_gather(x, i):
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0,),
            )
            return jax.lax.gather(
                x, i[:, None], dn, slice_sizes=(2, x.shape[1]),
                mode=jax.lax.GatherScatterMode.CLIP,
            ).sum()

        report(f"G pair gather slice(2,{C}) Q={Q}", pair_gather, x2, idx)
    if "H" in cases:
        x4c = jax.random.normal(key, (S, 4 * C), jnp.bfloat16)
        report(f"H take rows (S,{4*C}) Q={Q}",
               lambda x, i: jnp.take(x, i, axis=0).sum(), x4c, idx)
    if "I" in cases:
        # segment_sum backward alternative to scatter
        upd = jax.random.normal(key, (Q, C), jnp.bfloat16)
        report(f"I segment_sum (S,{C}) Q={Q}",
               lambda i, u: jax.ops.segment_sum(u, i, num_segments=S).sum(),
               idx, upd)


if __name__ == "__main__":
    main(sys.argv[1:])
