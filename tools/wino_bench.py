"""Winograd F(2x2,3x3) kernel vs XLA direct conv on the UNet hot shapes (real chip).

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/wino_bench.py check
    python tools/wino_bench.py bench         [BATCH=8 REPS=50 via env]

TFLOP/s reported in DIRECT-conv equivalent FLOPs (2*B*H*W*9*CIN*COUT) for both paths, so
the Winograd algorithmic advantage shows up as a higher rate.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from topomap_tpu.ops.winograd_conv import _wino_fwd, use_winograd

SHAPES = [
    (64, 64, 320, 320),
    (64, 64, 640, 320),
    (32, 32, 640, 640),
    (32, 32, 1280, 640),
    (16, 16, 1280, 1280),
]


def xla_conv3(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b


def check():
    for (h, wd, cin, cout) in SHAPES[:3]:
        x = jax.random.normal(jax.random.PRNGKey(0), (2, h, wd, cin), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.float32) * 0.02
        b = jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.float32)
        ref = xla_conv3(x, w, b)
        out = _wino_fwd(x, w, b, interpret=True)
        err = float(jnp.abs(out - ref).max())
        assert err < 2e-2, (h, wd, cin, cout, err)
        print(f"ok {h}x{wd}x{cin}->{cout} err {err:.2e}", file=sys.stderr)
    print(json.dumps({"check": "ok"}))


def bench():
    batch = int(os.environ.get("BATCH", "8"))
    reps = int(os.environ.get("REPS", "50"))
    table = {}
    for (h, wd, cin, cout) in SHAPES:
        key = f"{h}x{wd}x{cin}->{cout}"
        table[key] = {"dispatch": use_winograd((batch, h, wd, cin), (3, 3, cin, cout), 1, "SAME")}
        for name, fn in (("wino", lambda a, ww, bb: _wino_fwd(a, ww, bb)), ("xla", xla_conv3)):
            w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.bfloat16) * 0.02
            b = jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.bfloat16)

            @jax.jit
            def run(x0, w, b):
                def body(c, _):
                    y = fn(c, w, b)
                    if cin != cout:
                        y = jnp.tile(y, (1, 1, 1, cin // cout))
                    return y.astype(jnp.bfloat16), None

                return jnp.sum(jax.lax.scan(body, x0, None, length=reps)[0].astype(jnp.float32))

            xs = [jax.random.normal(jax.random.PRNGKey(10 + i), (batch, h, wd, cin), jnp.bfloat16)
                  for i in range(4)]
            jax.device_get(run(xs[0], w, b))
            jax.device_get(run(xs[1], w, b))
            t0 = time.perf_counter()
            jax.device_get(run(xs[2], w, b))
            jax.device_get(run(xs[3], w, b))
            dt = (time.perf_counter() - t0) / 2
            tf = 2.0 * batch * h * wd * cin * cout * 9 * reps / dt / 1e12
            table[key][name] = round(tf, 1)
            print(f"{key} {name}: {tf:.1f} TFLOP/s(direct-equiv)", file=sys.stderr, flush=True)
        table[key]["speedup"] = round(table[key]["wino"] / table[key]["xla"], 3)
    print(json.dumps(table))


if __name__ == "__main__":
    (check if (len(sys.argv) > 1 and sys.argv[1] == "check") else bench)()
