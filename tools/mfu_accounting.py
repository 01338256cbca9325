"""Exact-path MFU accounting (VERDICT r2 #5): pin "convs are at the roofline" with numbers.

One session, three measurements, so tunnel drift between runs cannot blur the ratio:

1. **FLOPs** of the exact 50-step CFG sampling executable (the bench.py headline program)
   from XLA's own ``compiled.cost_analysis()["flops"]`` — no hand-counting;
2. **warm s/batch** of that executable (block_until_ready after 2 finalization warmups,
   best of REPS — the bench.py protocol);
3. the **same-session MXU ceiling**: a square 4096³ bf16 GEMM scan timed with the
   device_get-scalar protocol (the 93.3 TFLOP/s figure of BENCH_NOTES drifted 66–93
   across sessions; measuring it *here* makes the % meaningful).

Prints one JSON line: achieved TFLOP/s, same-session ceiling, MFU vs ceiling, MFU vs the
197 TFLOP/s paper peak.

Usage: python tools/mfu_accounting.py   [BATCH=4 STEPS=50 REPS=3 via env]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import numpy as np

    from _distill_common import init_base
    from topomap_tpu.core import DDIMConfig, make_schedule
    from topomap_tpu.ops.flash_attention import best_attention_fn
    from topomap_tpu.pipeline import PipelineConfig, sample

    batch = int(os.environ.get("BATCH", "4"))
    steps = int(os.environ.get("STEPS", "50"))
    reps = int(os.environ.get("REPS", "3"))

    cfg = PipelineConfig.sd15_config3()
    sched = make_schedule(cfg.num_train_timesteps)
    attn = best_attention_fn()
    ddim = DDIMConfig(num_steps=steps, guidance_scale=7.5,
                      cfg_fork=os.environ.get("CFG_FORK", "1") == "1")

    print("init...", file=sys.stderr, flush=True)
    params, provenance = init_base(cfg, merge=True)
    params = {k: v for k, v in params.items()
              if k in ("unet", "vae", "controlnet", "unet_lora", "ctrl_lora")}
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    jax.block_until_ready(jax.tree.leaves(params)[0])

    seg = jax.random.uniform(jax.random.PRNGKey(5), (batch, 512, 512, 3))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, cfg.unet.context_dim))

    def run(p, r):
        img = sample(p, cfg, sched, ddim, r, seg, ctx, attn_fn=attn,
                     decode_dtype=jnp.bfloat16)
        return jnp.sum(img.astype(jnp.float32))

    print("compiling (lowered for cost analysis)...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    lowered = jax.jit(run).lower(params, jax.random.PRNGKey(0))
    compiled = lowered.compile()
    print(f"compile {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    ca_flops = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        ca_flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:  # cost model may be unavailable through the AOT service
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    # Primary numerator: analytic matmul+conv count over the traced jaxpr. The axon
    # AOT service's cost_analysis reported 18.3 TFLOP for this program where the
    # shape-determined count is ~413 TFLOP (22.6x undercount — it appears to miss
    # convolutions), so the compiled number is reported for reference only. The count
    # traces with XLA attention so attention matmuls appear as dot_general (the Pallas
    # kernel computes the same matmuls inside a pallas_call the walker cannot see).
    from topomap_tpu.models.attention import xla_attention

    from flop_counter import count_fn_flops

    def run_xla_attn(p, r):
        img = sample(p, cfg, sched, ddim, r, seg, ctx, attn_fn=xla_attention,
                     decode_dtype=jnp.bfloat16)
        return jnp.sum(img.astype(jnp.float32))

    flops = count_fn_flops(run_xla_attn, jax.eval_shape(lambda: params), jax.random.PRNGKey(0))
    print(f"jaxpr analytic flops {flops/1e12:.1f} TFLOP; compiled cost_analysis "
          f"{'n/a' if ca_flops is None else round(ca_flops/1e12, 1)} TFLOP", file=sys.stderr)

    # warm timing, bench.py protocol
    checksum = jax.device_get(compiled(params, jax.random.PRNGKey(0)))
    jax.device_get(compiled(params, jax.random.PRNGKey(0)))  # one-time finalization
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        jax.device_get(compiled(params, jax.random.PRNGKey(i)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    achieved = flops / best / 1e12

    # same-session square-GEMM ceiling
    m = k = n = 4096
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16) * 0.02
    GREPS = 50

    def gemm_scan(a, b):
        def body(c, _):
            return jnp.dot(c, b, preferred_element_type=jnp.bfloat16), None

        return jnp.sum(jax.lax.scan(body, a, None, length=GREPS)[0].astype(jnp.float32))

    g = jax.jit(gemm_scan)
    jax.device_get(g(a, b))
    jax.device_get(g(a, b))
    t0 = time.perf_counter()
    jax.device_get(g(a, b))
    jax.device_get(g(a, b))
    gdt = (time.perf_counter() - t0) / 2
    ceiling = 2.0 * m * k * n * GREPS / gdt / 1e12

    out = {
        "program": f"{steps}-step DDIM CFG batch {batch} (UNet+ControlNet+VAE decode, bf16)",
        "base": provenance,
        "cfg_fork": ddim.cfg_fork,
        "flops_per_batch_tflop": round(flops / 1e12, 1),
        "flops_source": "jaxpr matmul+conv analytic count (tools/flop_counter.py)",
        "compiled_cost_analysis_tflop": None if ca_flops is None else round(ca_flops / 1e12, 1),
        "warm_s_per_batch": round(best, 3),
        "times_s": [round(t, 3) for t in times],
        "achieved_tflops": round(achieved, 1),
        "same_session_sq_gemm_ceiling_tflops": round(ceiling, 1),
        "mfu_vs_ceiling_pct": round(100 * achieved / ceiling, 1),
        "mfu_vs_197_peak_pct": round(100 * achieved / 197.0, 1),
        "checksum": float(checksum),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
