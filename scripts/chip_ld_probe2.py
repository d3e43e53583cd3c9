"""Chip probe: where does LDConv's time go, and does a separable hat beat it?

Single-layer timing at the LD-P2 L1 shape (b32, 320x320x16 -> 160x160x32,
N=3, stride 2, bf16) for:
  gather    - exact packed 4-corner gather (the 70 img/s status quo)
  dense     - the hat-window path as shipped (auto cond + chunk scan)
  dense1    - forced dense, chunking disabled (one fused program)
  sep       - separable prototype: row-pass then col-pass (rank-1 hat),
              2*(2R+2) FMA terms per grid point instead of (2R+2)^2
  sepR1     - separable with R=1 (4+4 terms)

Timing: scan-chained carry-dependent loop (the trusted protocol).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.nn.modules import (
    LDConv,
    _ldconv_grid_pts,
    ldconv_hat_taps,
)

B, HX, WX, CIN = 32, 320, 320, 16
C2, N, S = 32, 3, 2
H = W = HX // S
DT = jnp.bfloat16
STEPS = 30


def sep_sample(xp, off_r, off_c, num_param, stride, R):
    """Separable hat sampling: rows then cols. Exact same math as
    ldconv_hat_sample (the 2D hat weight is rank-1: wr x wc)."""
    b, _, ww, c = xp.shape
    _, h, w, _ = off_r.shape
    taps = 2 * R + 2
    wr = ldconv_hat_taps(off_r, R).astype(xp.dtype)  # (B,h,w,N,T)
    wc = ldconv_hat_taps(off_c, R).astype(xp.dtype)
    outs = []
    for i, (pr_, pc_) in enumerate(_ldconv_grid_pts(num_param)):
        # row pass: contract row taps at full column resolution
        # columns we will need: pc_ + kc + j*stride for kc in [0,taps)
        wcols = pc_ + (w - 1) * stride + taps
        rowacc = jnp.zeros((b, h, wcols - pc_, c), xp.dtype)
        for kr in range(taps):
            sl = jax.lax.slice(
                xp,
                (0, pr_ + kr, pc_, 0),
                (b, pr_ + kr + (h - 1) * stride + 1, wcols, c),
                (1, stride, 1, 1),
            )
            rowacc = rowacc + wr[:, :, :, i, kr : kr + 1] * sl
        # col pass
        acc = jnp.zeros((b, h, w, c), xp.dtype)
        for kc in range(taps):
            sl = jax.lax.slice(
                rowacc,
                (0, 0, kc, 0),
                (b, h, kc + (w - 1) * stride + 1, c),
                (1, 1, stride, 1),
            )
            acc = acc + wc[:, :, :, i, kc : kc + 1] * sl
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


def timeit(fn, x, variables=None):
    """Scan-chained loop timing; returns ms/iter."""
    if variables is None:
        f = jax.jit(fn)
    else:
        f = jax.jit(lambda v, xx: fn(v, xx))

    def run(k):
        y = x
        for _ in range(k):
            if variables is None:
                y2 = f(y)
            else:
                y2 = f(variables, y)
            # chain: fold output back into input so nothing folds away
            y = y + 1e-6 * jnp.mean(y2.astype(jnp.float32)).astype(y.dtype)
        return jax.block_until_ready(y)

    run(2)  # compile + warm
    t0 = time.perf_counter()
    run(STEPS)
    t1 = time.perf_counter()
    return (t1 - t0) * 1000 / STEPS


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, HX, WX, CIN), DT)

    legs = {}

    for name, kw in [
        ("gather", dict(sampling="gather")),
        ("dense_auto", dict(sampling="auto")),
        ("dense1", dict(sampling="dense", chunk_budget=1 << 40)),
        ("denseR1", dict(sampling="dense", window_r=1, chunk_budget=1 << 40)),
    ]:
        mod = LDConv(c2=C2, num_param=N, stride=S, dtype=DT, **kw)
        v = mod.init(jax.random.PRNGKey(1), x)
        try:
            t0 = time.perf_counter()
            ms = timeit(lambda vv, xx: mod.apply(vv, xx), x, v)
            legs[name] = round(ms, 2)
            print(f"{name}: {ms:.2f} ms  (wall {time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    # separable prototypes (sampler only + a Dense proj to keep parity of work)
    import flax.linen as nn

    for name, R in [("sep", 2), ("sepR1", 1)]:
        pts = _ldconv_grid_pts(N)
        max_pr = max(p[0] for p in pts)
        max_pc = max(p[1] for p in pts)
        pad_r = max(0, (H - 1) * S + max_pr + R + 2 - HX)
        pad_c = max(0, (W - 1) * S + max_pc + R + 2 - WX)

        class Sep(nn.Module):
            @nn.compact
            def __call__(self, xx):
                off = nn.Conv(2 * N, (3, 3), (S, S), [(1, 1), (1, 1)],
                              kernel_init=nn.initializers.zeros,
                              dtype=DT, param_dtype=jnp.float32,
                              name="p_conv")(xx)
                b, h, w, _ = off.shape
                o = off.reshape(b, h, w, 2, N).astype(jnp.float32)
                xp = jnp.pad(xx, ((0, 0), (R, pad_r), (R, pad_c), (0, 0)),
                             mode="edge")
                feat = sep_sample(xp, o[..., 0, :], o[..., 1, :], N, S, R)
                y = nn.Dense(C2, use_bias=False, dtype=DT,
                             param_dtype=jnp.float32, name="proj")(feat)
                return y

        mod = Sep()
        v = mod.init(jax.random.PRNGKey(1), x)
        try:
            t0 = time.perf_counter()
            ms = timeit(lambda vv, xx: mod.apply(vv, xx), x, v)
            legs[name] = round(ms, 2)
            print(f"{name}: {ms:.2f} ms  (wall {time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    # roofline context: plain 3x3 stride-2 conv at the same shape
    import flax.linen as nn2
    conv = nn2.Conv(C2, (3, 3), (S, S), "SAME", dtype=DT, param_dtype=jnp.float32)
    v = conv.init(jax.random.PRNGKey(1), x)
    ms = timeit(lambda vv, xx: conv.apply(vv, xx), x, v)
    legs["plain_conv3x3"] = round(ms, 2)
    print(f"plain_conv3x3: {ms:.2f} ms", flush=True)

    import json
    print(json.dumps(legs), flush=True)


if __name__ == "__main__":
    main()
