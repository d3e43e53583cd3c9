"""Fine-grained chip probe for the LD-P2 inference path.

Separates backend init / compile / first run / steady-state dispatches with
timestamps so a hang is attributable to a specific phase.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

t0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter()-t0:7.1f}s] {msg}", flush=True)


def main(argv):
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    batch = int(kv.get("batch", 8))
    carry = kv.get("carry", "1") == "1"

    import jax
    import jax.numpy as jnp

    stamp(f"devices: {jax.devices()}")
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    model = DetectionModel("yolov8-LD-P2.yaml", dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0))
    stamp("model init done (cpu-side)")

    x = jnp.zeros((batch, 640, 640, 3), jnp.float32)

    if carry:
        @jax.jit
        def one(c, v, xx):
            boxes, scores = model.predict(v, xx + c * 1e-30)
            return jnp.sum(scores[0, 0]) + jnp.sum(boxes[0, 0])

        lowered = one.lower(jnp.float32(0.0), variables, x)
    else:
        @jax.jit
        def one(v, xx):
            boxes, scores = model.predict(v, xx)
            return jnp.sum(scores[0, 0]) + jnp.sum(boxes[0, 0])

        lowered = one.lower(variables, x)
    stamp("lowered")
    compiled = lowered.compile()
    stamp("compiled")

    if carry:
        c = jnp.float32(0.0)
        c = compiled(c, variables, x)
        jax.block_until_ready(c)
        stamp("first run done")
        for k in (5, 50):
            tt = time.perf_counter()
            for _ in range(k):
                c = compiled(c, variables, x)
            jax.block_until_ready(c)
            stamp(f"{k} chained dispatches: {time.perf_counter()-tt:.3f}s "
                  f"-> {batch*k/(time.perf_counter()-tt):.1f} img/s (incl fixed cost)")
    else:
        r = compiled(variables, x)
        jax.block_until_ready(r)
        stamp("first run done")
        for k in (5, 50):
            tt = time.perf_counter()
            for _ in range(k):
                r = compiled(variables, x)
            jax.block_until_ready(r)
            stamp(f"{k} independent dispatches: {time.perf_counter()-tt:.3f}s")


if __name__ == "__main__":
    main(sys.argv[1:])
