"""Capture a device trace of the warm 50-step sampling scan and print an op-time breakdown.

Usage (on the real TPU):
    python tools/profile_sample.py            # capture + analyze
    python tools/profile_sample.py /tmp/tr    # analyze an existing trace dir only

The capture runs the same program as bench.py (jitted lax.scan DDIM, batch 4, CFG, bf16,
Pallas attention) and wraps ONE warm repetition in ``jax.profiler.trace``. Analysis uses
the xprof package's framework_op_stats tool on the captured xplane and aggregates
self-time by op category so kernel work can be targeted (BENCH_NOTES.md trace table).
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(trace_dir: str):
    import contextlib

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from topomap_tpu.core import DDIMConfig, make_schedule
    from topomap_tpu.ops.flash_attention import best_attention_fn
    from topomap_tpu.pipeline import PipelineConfig, init_pipeline, sample, simulate_pretrained

    batch = int(os.environ.get("BENCH_BATCH", "4"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    cfg = PipelineConfig.sd15_config3()
    sched = make_schedule(cfg.num_train_timesteps)
    ddim = DDIMConfig(num_steps=steps, guidance_scale=7.5, eta=0.0)

    print("profile: init params...", file=sys.stderr, flush=True)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        ctx = jax.default_device(cpu)
    except Exception:
        ctx = contextlib.nullcontext()
    with ctx:
        params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), cfg), jax.random.PRNGKey(1))
        params = {k: v for k, v in params.items() if k in ("unet", "vae", "controlnet", "unet_lora", "ctrl_lora")}
        from topomap_tpu.lora import merge_lora

        params["unet"] = merge_lora(params["unet"], params.pop("unet_lora", None))
        params["controlnet"] = merge_lora(params["controlnet"], params.pop("ctrl_lora", None))
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(jax.tree.leaves(params)[0])

    seg = jnp.zeros((batch, 512, 512, 3), jnp.float32)
    context = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, cfg.unet.context_dim), jnp.float32)

    def run(params, rng):
        return sample(params, cfg, sched, ddim, rng, seg, context, attn_fn=best_attention_fn(),
                      decode_dtype=jnp.bfloat16)

    run_jit = jax.jit(run)
    print("profile: compiling...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(run_jit(params, jax.random.PRNGKey(0)))
    print(f"profile: compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(run_jit(params, jax.random.PRNGKey(1)))
    print(f"profile: warm {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(run_jit(params, jax.random.PRNGKey(2)))
    print(f"profile: traced into {trace_dir}", file=sys.stderr, flush=True)


CATEGORIES = (
    ("pallas_attn", ("flash", "attn_kernel", "custom-call", "closed_call", "tpu_custom_call")),
    ("pallas_gn", ("gn_silu", "group_norm_silu")),
    ("conv", ("convolution", "conv")),
    ("matmul", ("dot", "einsum", "matmul")),
    ("reduce/norm", ("reduce", "norm")),
    ("copy/transpose", ("copy", "transpose", "reshape", "bitcast", "pad", "slice", "concatenate")),
    ("elementwise", ("fusion", "add", "multiply", "subtract", "convert", "exp", "tanh", "logistic", "rsqrt")),
)


def analyze(trace_dir: str):
    from xprof.convert import raw_to_tool_data as rtd

    xplanes = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not xplanes:
        print(f"no xplane.pb under {trace_dir}", file=sys.stderr)
        return
    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    table = json.loads(data.decode() if isinstance(data, (bytes, bytearray)) else data)
    cols = [c["id"] for c in table["cols"]]
    i_cat = cols.index("category")
    i_name = cols.index("hlo_op_name")
    i_self = cols.index("total_self_time")
    buckets: dict = {}
    total = 0.0
    for row in table["rows"]:
        c = row["c"]
        cat = str(c[i_cat]["v"])
        name = str(c[i_name]["v"])
        t = float(c[i_self]["v"] or 0)
        total += t
        buckets.setdefault(cat, [0.0, {}])
        buckets[cat][0] += t
        d = buckets[cat][1]
        d[name] = d.get(name, 0.0) + t
    print(f"\n== device self-time by HLO category (total {total/1e6:.3f} s) ==")
    for cat, (t, ops) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
        print(f"{cat[:40]:40s} {t/1e6:8.3f} s  {100*t/total:5.1f}%")
        for name, ot in sorted(ops.items(), key=lambda kv: -kv[1])[:5]:
            print(f"    {ot/1e6:8.4f} s  {name[:110]}")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        analyze(sys.argv[1])
    else:
        trace_dir = os.environ.get("TRACE_DIR", "/tmp/topomap_trace")
        capture(trace_dir)
        analyze(trace_dir)
