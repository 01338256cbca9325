"""int8-MXU probe: does XLA on this chip run int8 convs/GEMMs materially faster than bf16?

v5e lists int8 peak at ~2x the bf16 rate (394 vs 197 T-ops). Convolutions are the
dominant cost of the exact sampling step (BENCH_NOTES trace), so a W8A8 quantized
sampling mode would be the biggest remaining single-chip lever — IF the compiler
actually lowers int8 contractions onto the fast path through this runtime. This probe
measures that, shape-for-shape against bf16, before any quantization work is invested:

* 3x3 SAME convs at the UNet hot shapes: int8 x int8 -> int32 accum, then a per-channel
  fp32 rescale (the shape a real W8A8 kernel would take) vs the bf16 conv.
* the square 4096^3 GEMM (the practical-ceiling reference point: bf16 measured 93 TFLOP/s
  through this runtime, tools/gemm_roofline.py).

Timing protocol per CLAUDE.md: jitted lax.scan bodies, scalar output fetched with
device_get (block_until_ready does not synchronize small programs on this backend),
3rd+ call timed (2nd pays one-time finalization).

Usage:  python tools/int8_probe.py    [BATCH=8 REPS=50 via env]
Prints one JSON line {shape: {bf16_tflops, int8_tops, ratio}}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_scan(f, args, n_warm=2):
    import jax

    for i in range(n_warm):
        jax.device_get(f(*args[i % len(args)]))
    t0 = time.perf_counter()
    jax.device_get(f(*args[-1]))
    jax.device_get(f(*args[-2]))
    return (time.perf_counter() - t0) / 2


def main():
    import jax
    import jax.numpy as jnp

    batch = int(os.environ.get("BATCH", "8"))
    reps = int(os.environ.get("REPS", "50"))
    results = {}

    shapes = [
        (64, 64, 320, 320, "unet L0 res"),
        (64, 64, 640, 320, "unet L0 dec"),
        (32, 32, 640, 640, "unet L1 res"),
        (16, 16, 1280, 1280, "unet L2 res"),
    ]

    for h, w, cin, cout, note in shapes:
        b = batch
        key = jax.random.PRNGKey(0)

        def conv_bf16(x, k):
            def body(c, _):
                y = jax.lax.conv_general_dilated(
                    c, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
                )
                return y[..., :cin] if cout >= cin else jnp.pad(
                    y, ((0, 0),) * 3 + ((0, cin - cout),)
                ), None

            return jnp.sum(jax.lax.scan(body, x, None, length=reps)[0].astype(jnp.float32))

        def conv_int8(x, k, scale):
            def body(c, _):
                y = jax.lax.conv_general_dilated(
                    c, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                # per-channel fp32 rescale + re-quantize to int8 for the next layer —
                # the steady-state shape of a W8A8 pipeline
                yq = jnp.clip(
                    (y.astype(jnp.float32) * scale), -127, 127
                ).astype(jnp.int8)
                return yq[..., :cin] if cout >= cin else jnp.pad(
                    yq, ((0, 0),) * 3 + ((0, cin - cout),)
                ), None

            return jnp.sum(jax.lax.scan(body, x, None, length=reps)[0].astype(jnp.int32))

        xb = [jax.random.normal(jax.random.PRNGKey(10 + i), (b, h, w, cin), jnp.bfloat16)
              for i in range(4)]
        kb = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)
        xi = [jax.random.randint(jax.random.PRNGKey(20 + i), (b, h, w, cin), -127, 127,
                                 jnp.int8) for i in range(4)]
        ki = jax.random.randint(jax.random.PRNGKey(2), (3, 3, cin, cout), -127, 127, jnp.int8)
        sc = jnp.full((cout,), 1e-3, jnp.float32)

        dt_b = _time_scan(jax.jit(conv_bf16), [(x, kb) for x in xb])
        try:
            dt_i = _time_scan(jax.jit(conv_int8), [(x, ki, sc) for x in xi])
        except Exception as e:  # int8 conv may not lower on this backend at all
            results[f"{h}x{w}x{cin}->{cout}"] = {"error": str(e)[:200]}
            print(f"{note}: int8 conv FAILED: {str(e)[:120]}", file=sys.stderr, flush=True)
            continue
        ops = 2.0 * b * h * w * cin * cout * 9 * reps
        r = {
            "bf16_tflops": round(ops / dt_b / 1e12, 1),
            "int8_tops": round(ops / dt_i / 1e12, 1),
            "ratio": round(dt_b / dt_i, 2),
        }
        results[f"{h}x{w}x{cin}->{cout}"] = r
        print(f"{h}x{w} {cin}->{cout} {note}: bf16 {r['bf16_tflops']} | int8 "
              f"{r['int8_tops']} | speedup {r['ratio']}x", file=sys.stderr, flush=True)

    # square-GEMM ceiling reference
    n = 4096
    def gemm(x, w):
        def body(c, _):
            y = jax.lax.dot_general(c, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return jnp.clip(y, -127, 127).astype(jnp.int8), None
        return jnp.sum(jax.lax.scan(body, x, None, length=reps)[0].astype(jnp.int32))

    def gemm_bf16(x, w):
        def body(c, _):
            y = jax.lax.dot_general(c, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16), None
        return jnp.sum(jax.lax.scan(body, x, None, length=reps)[0].astype(jnp.float32))

    xs8 = [jax.random.randint(jax.random.PRNGKey(30 + i), (n, n), -127, 127, jnp.int8)
           for i in range(4)]
    w8 = jax.random.randint(jax.random.PRNGKey(3), (n, n), -127, 127, jnp.int8)
    xsb = [jax.random.normal(jax.random.PRNGKey(40 + i), (n, n), jnp.bfloat16)
           for i in range(4)]
    wb = jax.random.normal(jax.random.PRNGKey(4), (n, n), jnp.bfloat16)
    ops = 2.0 * n * n * n * reps
    dt_b = _time_scan(jax.jit(gemm_bf16), [(x, wb) for x in xsb])
    try:
        dt_i = _time_scan(jax.jit(gemm), [(x, w8) for x in xs8])
        results["gemm_4096^3"] = {
            "bf16_tflops": round(ops / dt_b / 1e12, 1),
            "int8_tops": round(ops / dt_i / 1e12, 1),
            "ratio": round(dt_b / dt_i, 2),
        }
        print(f"gemm 4096^3: {results['gemm_4096^3']}", file=sys.stderr, flush=True)
    except Exception as e:
        results["gemm_4096^3"] = {"error": str(e)[:200]}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
