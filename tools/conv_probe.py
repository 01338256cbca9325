"""Per-shape conv utilization probe: achieved TFLOP/s of XLA's conv on the SD1.5 shapes.

Convolutions are ~50% of the warm sampling step (BENCH_NOTES trace table). This probe
times each distinct conv shape of the UNet/ControlNet/VAE in isolation (jitted
``lax.scan`` of REPS convs, avoiding per-dispatch overhead) and reports achieved TFLOP/s
— the data a future custom conv kernel must beat, shape by shape. v5e bf16 peak ≈ 197
TFLOP/s.

Usage:  python tools/conv_probe.py     [BATCH=8 REPS=50 via env]
Prints one JSON line {shape: tflops}.
"""
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    batch = int(os.environ.get("BATCH", "8"))  # CFG-effective batch of the bench
    reps = int(os.environ.get("REPS", "50"))

    # (H, W, Cin, Cout, note) — the hot 3x3 stride-1 convs of the sampling step
    shapes = [
        (64, 64, 320, 320, "unet L0 res"),
        (64, 64, 640, 320, "unet L0 dec skip-cat"),
        (32, 32, 640, 640, "unet L1 res"),
        (16, 16, 1280, 1280, "unet L2 res"),
        (8, 8, 1280, 1280, "unet L3/mid res"),
        (128, 128, 256, 256, "vae dec upper"),
        (256, 256, 128, 128, "vae dec mid"),
        (512, 512, 128, 128, "vae dec full-res"),
    ]

    results = {}
    for h, w, cin, cout, note in shapes:
        b = batch if h <= 64 else max(1, batch // 2)  # vae decode runs at B, not 2B
        x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.bfloat16)

        def run(x, k):
            def body(c, _):
                y = jax.lax.conv_general_dilated(
                    c, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
                )
                # keep channel count stable so the scan carry type is fixed
                return y[..., :cin] if cout >= cin else jnp.pad(y, ((0, 0),) * 3 + ((0, cin - cout),)), None

            # scalar output: forces the whole chain AND makes the host fetch trivial —
            # on this remote backend block_until_ready alone does not synchronize small
            # programs (timings came out >100x over hardware peak), so we device_get
            return jnp.sum(jax.lax.scan(body, x, None, length=reps)[0].astype(jnp.float32))

        f = jax.jit(run)
        # distinct inputs per call (the backend also caches identical calls)
        xs = [jax.random.normal(jax.random.PRNGKey(10 + i), x.shape, x.dtype)
              for i in range(4)]
        jax.device_get(f(xs[0], k))
        jax.device_get(f(xs[1], k))  # finalization
        t0 = time.perf_counter()
        jax.device_get(f(xs[2], k))
        jax.device_get(f(xs[3], k))
        dt = (time.perf_counter() - t0) / 2
        flops = 2.0 * b * h * w * cin * cout * 9 * reps
        tf = flops / dt / 1e12
        results[f"{h}x{w}x{cin}->{cout} ({note})"] = round(tf, 1)
        print(f"{h:4d}x{w:<4d} {cin:4d}->{cout:<4d} {note:22s} {tf:7.1f} TFLOP/s",
              file=sys.stderr, flush=True)

    print(json.dumps({"achieved_tflops": results, "batch": batch,
                      "peak_bf16_tflops": 197}))


if __name__ == "__main__":
    main()
