"""GEMM roofline for the conv-equivalent shapes: what does a plain bf16 matmul achieve
on the chip at the (M, K, N) aspect ratios of the UNet 3x3 convs?

If dense GEMM >> XLA conv on the same shape, the conv emitter is the gap and a pallas
im2col kernel can win; if dense GEMM ~= XLA conv, ~65 TFLOP/s is the aspect-ratio
ceiling (N narrow) and the conv fight is over.

Also measures the channel-padding question: conv 64x64x320->320 vs the same conv with
channels pre-padded to 384 (lane-aligned weights at rest) — effective TFLOP/s counted
over the 320 useful channels.

Usage: python tools/gemm_roofline.py            [REPS=50 via env]
Prints one JSON line.  Timing per CLAUDE.md: scalar-sum + device_get around a scan.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPS = int(os.environ.get("REPS", "50"))

# (M, K, N) = (B*H*W, 9*CIN, COUT) im2col equivalents, batch 8
GEMMS = [
    (8 * 64 * 64, 9 * 640, 320),    # 64x64x640->320
    (8 * 32 * 32, 9 * 640, 640),    # 32x32x640->640
    (8 * 32 * 32, 9 * 1280, 640),   # 32x32x1280->640
    (8 * 16 * 16, 9 * 1280, 1280),  # 16x16x1280->1280
    (8 * 8 * 8, 9 * 1280, 1280),    # 8x8x1280->1280
    (8 * 64 * 64, 9 * 320, 320),    # 64x64x320->320
    # per-tap GEMM shapes (K=CIN) for comparison with the 9-GEMM kernel's unit work
    (8 * 32 * 32, 640, 640),
    (8 * 16 * 16, 1280, 1280),
    # square control: how close to 197 does ANY shape get on this chip?
    (4096, 4096, 4096),
]


def time_scalar(fn, *args):
    """Median-of-2 steady-state timing with finalization warmup."""
    f = jax.jit(fn)
    jax.device_get(f(*args))
    jax.device_get(f(*args))  # one-time finalization
    t0 = time.perf_counter()
    jax.device_get(f(*args))
    jax.device_get(f(*args))
    return (time.perf_counter() - t0) / 2


def main():
    out = {}
    for (m, k, n) in GEMMS:
        a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16) * 0.02

        def run(a, b):
            def body(c, _):
                y = jnp.dot(c, b, preferred_element_type=jnp.bfloat16)
                # keep carry shape: fold N back to K cheaply
                if n != k:
                    y = jnp.tile(y, (1, (k + n - 1) // n))[:, :k]
                return y, None

            return jnp.sum(jax.lax.scan(body, a, None, length=REPS)[0].astype(jnp.float32))

        dt = time_scalar(run, a, b)
        tf = 2.0 * m * k * n * REPS / dt / 1e12
        out[f"{m}x{k}x{n}"] = round(tf, 1)
        print(f"gemm {m}x{k}x{n}: {tf:.1f} TFLOP/s", file=sys.stderr, flush=True)

    # channel-padding experiment: 64x64 320->320 conv, plain vs padded-to-384
    bsz, h, w = 8, 64, 64
    for cin, cpad in ((320, 320), (320, 384)):
        x = jax.random.normal(jax.random.PRNGKey(0), (bsz, h, w, cpad), jnp.bfloat16)
        wk = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cpad, cpad), jnp.bfloat16) * 0.02
        if cpad != cin:  # zero the pad channels of the weights (output pad lanes unused)
            wk = wk.at[:, :, cin:, :].set(0).at[:, :, :, cin:].set(0)

        def run(x, wk):
            def body(c, _):
                y = jax.lax.conv_general_dilated(
                    c, wk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return y, None

            return jnp.sum(jax.lax.scan(body, x, None, length=REPS)[0].astype(jnp.float32))

        dt = time_scalar(run, x, wk)
        tf = 2.0 * bsz * h * w * cin * cin * 9 * REPS / dt / 1e12  # useful FLOPs only
        out[f"conv64_{cin}in{cpad}"] = round(tf, 1)
        print(f"conv 64x64 {cin} @ {cpad} lanes: {tf:.1f} effective TFLOP/s",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
