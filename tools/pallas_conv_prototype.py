"""Prototype Pallas 3×3 conv kernel vs XLA's conv on the UNet L0 shape (64×64×320→320).

Round-2 groundwork (BENCH_NOTES: convs are 50% of the exact step; XLA achieves
~62 TFLOP/s = 31% of bf16 peak on this shape). The kernel computes the conv as 9
accumulated [4096,320]×[320,320] MXU GEMMs over an H/W-padded image held in VMEM —
one grid cell per batch image, f32 accumulator, bf16 I/O. The inherent 320→384
output-lane padding bounds the ceiling at ~164 TFLOP/s.

Usage:
    JAX_PLATFORMS=cpu python tools/pallas_conv_prototype.py check    # interpret-mode parity
    python tools/pallas_conv_prototype.py bench                      # TPU timing
Prints one JSON line.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

H = W = 64
CIN = COUT = 320


ROWS = 16  # rows per grid cell (H/ROWS cells per image)


def _conv3_kernel(x_ref, w_ref, o_ref):
    """x_ref [1, H+2, W+2, CIN] bf16 (pre-padded, whole image, batch-indexed);
    w_ref [9, CIN, COUT]; o_ref [1, ROWS*W, COUT] (row-block indexed).
    Grid (B, H//ROWS): smaller output blocks pipeline the write-back."""
    r = pl.program_id(1) * ROWS
    acc = jnp.zeros((ROWS, W, COUT), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, pl.dslice(r + dy, ROWS), pl.dslice(dx, W), :]
            acc += jax.lax.dot_general(
                xs, w_ref[dy * 3 + dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[0, ...] = acc.reshape(ROWS * W, COUT).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_conv3(x, w, interpret=False):
    """x [B,H,W,CIN] bf16; w [3,3,CIN,COUT] -> [B,H,W,COUT] bf16 (SAME, stride 1)."""
    b = x.shape[0]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9, CIN, COUT)
    out = pl.pallas_call(
        _conv3_kernel,
        grid=(b, H // ROWS),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, CIN), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((9, CIN, COUT), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ROWS * W, COUT), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, H * W, COUT), x.dtype),
        interpret=interpret,
    )(xp.reshape(b, H + 2, W + 2, CIN), wf)
    return out.reshape(b, H, W, COUT)


def xla_conv3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def check():
    import numpy as np

    x = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, CIN), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, CIN, COUT), jnp.float32) * 0.05
    ref = xla_conv3(x, w)
    out = pallas_conv3(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)
    print(json.dumps({"check": "ok", "max_err": float(jnp.abs(out - ref).max())}))


def bench():
    batch = int(os.environ.get("BATCH", "8"))
    reps = int(os.environ.get("REPS", "50"))
    results = {}
    for name, fn in (("pallas", lambda a, b_: pallas_conv3(a, b_)), ("xla", xla_conv3)):
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, CIN, COUT), jnp.bfloat16) * 0.05

        @jax.jit
        def run(x0, w):
            def body(c, _):
                return fn(c, w), None

            return jnp.sum(jax.lax.scan(body, x0, None, length=reps)[0].astype(jnp.float32))

        xs = [jax.random.normal(jax.random.PRNGKey(10 + i), (batch, H, W, CIN), jnp.bfloat16)
              for i in range(4)]
        jax.device_get(run(xs[0], w))
        jax.device_get(run(xs[1], w))  # finalization
        t0 = time.perf_counter()
        jax.device_get(run(xs[2], w))
        jax.device_get(run(xs[3], w))
        dt = (time.perf_counter() - t0) / 2
        tf = 2.0 * batch * H * W * CIN * COUT * 9 * reps / dt / 1e12
        results[name] = round(tf, 1)
        print(f"{name}: {tf:.1f} TFLOP/s", file=sys.stderr, flush=True)
    results["speedup"] = round(results["pallas"] / results["xla"], 3)
    print(json.dumps({"shape": f"{H}x{W}x{CIN}->{COUT}", "tflops": results}))


if __name__ == "__main__":
    (check if (len(sys.argv) > 1 and sys.argv[1] == "check") else bench)()
