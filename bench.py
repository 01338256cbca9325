"""Benchmark: stylized 512² tiles/sec/chip at 50 DDIM steps on the flagship SD1.5 pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}. ``vs_baseline`` is measured
against the north-star target of 8 tiles/sec/chip (BASELINE.json — the reference itself
publishes no numbers; see BASELINE.md).

The measured program is the production sampling path: jitted lax.scan over 50 DDIM steps,
each step one batched-2B (cond+uncond CFG) UNet+ControlNet forward in bfloat16 with the
Pallas attention kernel, followed by the VAE decode — everything on device.

Env knobs: BENCH_BATCH (default 4), BENCH_STEPS (default 50), BENCH_REPS (default 3),
BENCH_TINY=1 (smoke-test geometry for debugging), BENCH_KV_DS=f (opt-in ToDo K/V pooling
at high-res self-attention levels), BENCH_COMPILER_OPTS ("k=v,k=v" XLA
options forwarded to jax.jit(compiler_options=...) — the axon backend accepts TPU flags
here that the local XLA_FLAGS parser rejects, e.g. xla_tpu_scoped_vmem_limit_kib=65536).
"""
import contextlib
import json
import os
import sys
import time


def _compiler_options():
    """Parse BENCH_COMPILER_OPTS into a jax.jit compiler_options dict (ints auto-typed)."""
    raw = os.environ.get("BENCH_COMPILER_OPTS", "").strip()
    if not raw:
        return None
    opts = {}
    for kv in raw.split(","):
        k, _, v = kv.partition("=")
        try:
            opts[k.strip()] = int(v)
        except ValueError:
            opts[k.strip()] = v.strip()
    return opts


def main():
    import jax

    # rbg PRNG: ~10x faster host-side init than threefry (init runs on CPU; values are
    # arbitrary random weights, counter-based determinism is not needed here)
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from topomap_tpu.core import DDIMConfig, make_schedule
    from topomap_tpu.ops.flash_attention import best_attention_fn
    from topomap_tpu.pipeline import (
        PipelineConfig,
        init_pipeline,
        sample,
        simulate_pretrained,
    )

    if os.environ.get("BENCH_MODE") == "train":
        return bench_train()
    tiny = os.environ.get("BENCH_TINY") == "1"
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    reps = int(os.environ.get("BENCH_REPS", "5"))

    cfg = PipelineConfig.tiny() if tiny else PipelineConfig.sd15_config3()
    size = 32 if tiny else 512
    ctx_dim = cfg.unet.context_dim
    sched = make_schedule(cfg.num_train_timesteps)
    cfg_interval = int(os.environ.get("BENCH_CFG_INTERVAL", "1"))
    dc_interval = int(os.environ.get("BENCH_DEEP_CACHE", "1"))
    scale = float(os.environ.get("BENCH_SCALE", "7.5"))  # 1.0 = CFG-free (distilled student)
    ddim = DDIMConfig(num_steps=steps, guidance_scale=scale, eta=0.0, cfg_interval=cfg_interval,
                      deep_cache_interval=dc_interval,
                      unroll=int(os.environ.get("BENCH_UNROLL", "1")),
                      solver=os.environ.get("BENCH_DDIM_SOLVER", "ddim"),
                      cfg_fork=os.environ.get("BENCH_CFG_FORK", "1") == "1")
    which_attn = os.environ.get("BENCH_ATTN", "pallas_tt")
    if which_attn == "pallas":
        from topomap_tpu.ops.flash_attention import pallas_attention as attn_fn
    elif which_attn == "pallas_tt":
        from topomap_tpu.ops.flash_attention import pallas_attention_tt as attn_fn
    elif which_attn == "xla":
        from topomap_tpu.models.attention import xla_attention as attn_fn
    else:
        attn_fn = best_attention_fn()
    kv_ds = int(os.environ.get("BENCH_KV_DS", "1"))
    if kv_ds > 1:  # opt-in ToDo K/V pooling (approximate; see models.attention)
        from topomap_tpu.models.attention import with_kv_downsample

        attn_fn = with_kv_downsample(attn_fn, kv_ds)

    print(f"bench: init params ({'tiny' if tiny else 'sd15'})...", file=sys.stderr, flush=True)
    # Init on host CPU: the init path is thousands of tiny ops — on a remote-TPU backend each
    # would be a round trip. One device_put ships the finished tree.
    t0 = time.perf_counter()
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), cfg), jax.random.PRNGKey(1))
        # sampling does not need the text towers; keep only the hot path in device HBM
        params = {k: v for k, v in params.items() if k in ("unet", "vae", "controlnet", "unet_lora", "ctrl_lora")}
    # Inference-time LoRA fusion (topomap_tpu.lora.merge_lora): W_eff = W + scale*A*B —
    # measured 2.7x per-step win over runtime adapters on v5e.
    if os.environ.get("BENCH_MERGE", "1") == "1":
        from topomap_tpu.lora import merge_lora

        with ctx:
            params["unet"] = merge_lora(params["unet"], params.pop("unet_lora", None))
            params["controlnet"] = merge_lora(params["controlnet"], params.pop("ctrl_lora", None))
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(jax.tree.leaves(params)[0])
    print(f"bench: params ready in {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    seg = jnp.zeros((batch, size, size, 3), jnp.float32)
    context = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, ctx_dim), jnp.float32)

    import jax.numpy as _jnp

    decode_dtype = _jnp.bfloat16 if os.environ.get("BENCH_DECODE_BF16", "1") == "1" else _jnp.float32

    # BENCH_SAMPLER=consistency: few-step distilled-student throughput (CFG-free, single
    # model eval per step — topomap_tpu.core.consistency; train with `topomap distill`).
    sampler = os.environ.get("BENCH_SAMPLER", "ddim")
    if sampler == "consistency":
        from topomap_tpu.pipeline import sample_consistency

        def run(params, rng):
            return sample_consistency(params, cfg, sched, steps, rng, seg, context,
                                      attn_fn=attn_fn, decode_dtype=decode_dtype)
    else:
        def run(params, rng):
            return sample(params, cfg, sched, ddim, rng, seg, context, attn_fn=attn_fn,
                          decode_dtype=decode_dtype)

    # Synchronization protocol: block_until_ready does NOT reliably synchronize every
    # executable on this remote backend (observed: 0.00 s "times" on the kv-ds variant
    # while the first call blocked fine). Returning a checksum scalar and timing
    # jax.device_get forces a real round trip — the scalar fetch adds ~ms against
    # multi-second programs and is applied identically to every mode.
    def run_sync(params, rng):
        out = run(params, rng)
        return jnp.sum(out.astype(jnp.float32))

    run_jit = jax.jit(run_sync, compiler_options=_compiler_options())
    print("bench: compiling...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    chk = jax.device_get(run_jit(params, jax.random.PRNGKey(0)))
    print(f"bench: compile+first run {time.perf_counter()-t0:.1f}s (checksum {float(chk):.3f})",
          file=sys.stderr, flush=True)
    # second warmup: on this backend the SECOND execution of a large executable pays a
    # one-time ~240 s finalization cost; steady state starts at the THIRD call.
    t0 = time.perf_counter()
    jax.device_get(run_jit(params, jax.random.PRNGKey(997)))
    print(f"bench: warmup-2 {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        chk = jax.device_get(run_jit(params, jax.random.PRNGKey(i + 1)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    median = sorted(times)[len(times) // 2]
    tiles_per_sec = batch / best
    print(f"bench: times={['%.2f' % t for t in times]}s batch={batch} steps={steps} "
          f"best {best:.2f}s median {median:.2f}s", file=sys.stderr, flush=True)

    print(
        json.dumps(
            {
                "metric": (
                    f"stylized {size}x{size} tiles/sec/chip @ {steps} consistency-student steps (SD1.5+ControlNet, CFG-free, bf16)"
                    if sampler == "consistency"
                    else f"stylized {size}x{size} tiles/sec/chip @ {steps} {'DPM-Solver++(2M)' if ddim.solver == 'dpm' else 'DDIM'} steps (SD1.5+ControlNet, {'CFG-free' if scale == 1.0 else 'CFG'}{'' if cfg_interval == 1 else f'-lazy{cfg_interval}'}{'' if dc_interval == 1 else f', deepcache-{dc_interval}'}{'' if kv_ds == 1 else f', kvds-{kv_ds}'}{', cfg-fork' if ddim.cfg_fork and scale != 1.0 else ''}, bf16)"
                ),
                "value": round(tiles_per_sec, 4),
                "unit": "tiles/sec/chip",
                "vs_baseline": round(tiles_per_sec / 8.0, 4),
                # tunnel-noise context (VERDICT r3 weak #6): median-of-reps alongside best
                "median_value": round(batch / median, 4),
                "rep_times_s": [round(t, 3) for t in times],
            }
        )
    )




def bench_train():
    """Training-throughput mode (BENCH_MODE=train): steps/sec of the jitted config-3 train
    step at 512^2, bf16, remat. Not the driver metric — prints its own JSON line."""
    import contextlib

    import jax
    import jax.numpy as jnp

    from topomap_tpu.core import make_schedule
    from topomap_tpu.ops.flash_attention import best_attention_fn
    from topomap_tpu.pipeline import PipelineConfig, init_pipeline, make_tokenizers, simulate_pretrained
    from topomap_tpu.train.optim import OptimConfig, build_optimizer
    from topomap_tpu.train.trainer import init_train_state, make_train_step

    batch = int(os.environ.get("BENCH_BATCH", "2"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    cfg = PipelineConfig.sd15_config3()
    sched = make_schedule(cfg.num_train_timesteps)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        ctx = jax.default_device(cpu)
    except Exception:
        ctx = contextlib.nullcontext()
    print("bench-train: init...", file=sys.stderr, flush=True)
    with ctx:
        params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), cfg), jax.random.PRNGKey(1))
    params = jax.device_put(params, jax.devices()[0])
    tx, part = build_optimizer(params, OptimConfig("config3", total_steps=150_000, warmup=15_000))
    state = init_train_state(params, tx, part)
    scan_steps = int(os.environ.get("BENCH_SCAN", "25"))
    from topomap_tpu.train.trainer import make_train_scan

    step_fn = jax.jit(
        make_train_scan(
            make_train_step(cfg, sched, tx, part, "config3", attn_fn=best_attention_fn(), remat=True),
            scan_steps,
        ),
        donate_argnums=0,
        compiler_options=_compiler_options(),
    )
    tok, _ = make_tokenizers(cfg)
    ids, mask = tok.encode(["Set Forest color to dark green"] * batch)
    batch_d = {
        "seg": jnp.zeros((scan_steps, batch, size, size, 3)),
        "gt": jnp.zeros((scan_steps, batch, size, size, 3)),
        "ids": jnp.tile(jnp.asarray(ids)[None], (scan_steps, 1, 1)),
        "mask": jnp.tile(jnp.asarray(mask)[None], (scan_steps, 1, 1)),
    }
    rng = jax.random.PRNGKey(7)
    print("bench-train: compiling...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    state, m = step_fn(state, batch_d, rng)
    jax.block_until_ready(m["loss"])
    print(f"bench-train: compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    # Second execution pays a one-time executable finalization cost on this backend
    # (~240 s measured); steady state starts at the third call.
    t0 = time.perf_counter()
    state, m = step_fn(state, batch_d, rng)
    jax.block_until_ready(m["loss"])
    print(f"bench-train: second (finalization) {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        state, m = step_fn(state, batch_d, rng)
        jax.block_until_ready(m["loss"])
        times.append(time.perf_counter() - t0)
    print(f"bench-train: warm times {['%.2f' % t for t in times]}s", file=sys.stderr, flush=True)
    dt = min(times) / scan_steps
    print(json.dumps({
        "metric": f"config3 train steps/sec/chip at batch {batch}, {size}^2, bf16, remat, scan{scan_steps}",
        "value": round(1.0 / dt, 4),
        "unit": "steps/sec/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
