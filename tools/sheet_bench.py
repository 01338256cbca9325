"""Full-sheet product benchmark: stylize a 10×10 = 5120² map sheet on ONE chip.

The reference's end-to-end product pipeline (`BaseModel/README.docx`: evaluateCN.py per
tile, sequential GPU sampling with a host round-trip per tile, then host stitchTiles.py)
publishes no timing beyond a wall-clock print. Here the whole sheet runs as 25 dispatches
of one compiled batch-4 sampler (same program each time), with device-side stitching.

Usage:  python tools/sheet_bench.py          [STEPS=50 DC=2 BATCH=4 TILES=100 via env]
Prints one JSON line {sheet_seconds, tiles_per_sec, mode}.
"""
import contextlib
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

    from topomap_tpu.core import DDIMConfig, make_schedule
    from topomap_tpu.data.synthetic import generate_seg_tile
    from topomap_tpu.ops.image import from_signed, stitch_tiles, to_unit
    from topomap_tpu.ops.flash_attention import best_attention_fn
    from topomap_tpu.pipeline import (
        PipelineConfig,
        init_pipeline,
        merge_for_sampling,
        sample,
        sample_consistency,
        simulate_pretrained,
    )

    steps = int(os.environ.get("STEPS", "50"))
    dc = int(os.environ.get("DC", "2"))
    batch = int(os.environ.get("BATCH", "4"))
    n_tiles = int(os.environ.get("TILES", "100"))
    sampler = os.environ.get("SHEET_SAMPLER", "ddim")
    kv_ds = int(os.environ.get("KV_DS", "1"))
    cfg = PipelineConfig.sd15_config3()
    sched = make_schedule(cfg.num_train_timesteps)
    attn = best_attention_fn()
    if kv_ds > 1:  # opt-in ToDo K/V pooling (approximate; see models.attention)
        from topomap_tpu.models.attention import with_kv_downsample

        attn = with_kv_downsample(attn, kv_ds)
    ddim = DDIMConfig(steps, 7.5, deep_cache_interval=dc)

    print("init...", file=sys.stderr, flush=True)
    try:
        ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
    except Exception:
        ctx = contextlib.nullcontext()
    with ctx:
        base_npz = os.environ.get("BASE_NPZ")
        if base_npz:
            # trained full-trunk base (+ pretrain-vae overlay) — product numbers on
            # trained weights instead of the simulated bundle (VERDICT r4 #8)
            from topomap_tpu.utils.checkpoint import load_base_npz, load_filtered

            params = load_base_npz(init_pipeline(jax.random.PRNGKey(42), cfg), base_npz)
            if os.environ.get("VAE"):
                params = load_filtered(params, os.environ["VAE"], "vae")
            print(f"trained base: {base_npz}", file=sys.stderr)
        else:
            params = simulate_pretrained(
                init_pipeline(jax.random.PRNGKey(0), cfg), jax.random.PRNGKey(1)
            )
        params = {k: v for k, v in params.items()
                  if k in ("unet", "vae", "controlnet", "unet_lora", "ctrl_lora")}
        params = merge_for_sampling(params)
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(jax.tree.leaves(params)[0])

    tiles_np = np.stack([generate_seg_tile(i) for i in range(n_tiles)])  # [N,512,512,3] u8
    context = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, cfg.unet.context_dim))

    if sampler == "consistency":
        fn = jax.jit(lambda p, seg, r: sample_consistency(
            p, cfg, sched, steps, r, seg, context, attn_fn=attn,
            decode_dtype=jnp.bfloat16))
        mode = f"consistency-{steps}"
    else:
        fn = jax.jit(lambda p, seg, r: sample(
            p, cfg, sched, ddim, r, seg, context, attn_fn=attn,
            decode_dtype=jnp.bfloat16))
        mode = f"ddim-{steps}-cfg" + (f"-dc{dc}" if dc > 1 else "") + \
            (f"-kvds{kv_ds}" if kv_ds > 1 else "")

    print("compile + warmup...", file=sys.stderr, flush=True)
    warm = to_unit(jnp.asarray(tiles_np[:batch]))
    for i in range(3):  # 2nd execution pays one-time finalization on this backend
        jax.block_until_ready(fn(params, warm, jax.random.PRNGKey(i)))

    print("sheet run...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    outs = []
    for start in range(0, n_tiles, batch):
        seg = to_unit(jnp.asarray(tiles_np[start:start + batch]))
        outs.append(from_signed(fn(params, seg, jax.random.PRNGKey(100 + start))))
    side = int(n_tiles ** 0.5)
    sheet = stitch_tiles(jnp.concatenate(outs, axis=0), side, side)
    # device_get of a checksum: block_until_ready does not synchronize every executable
    # on this backend (see bench.py) — the scalar fetch forces a real round trip
    jax.device_get(jnp.sum(sheet.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    assert sheet.shape == (side * 512, side * 512, 3)
    print(json.dumps({
        "mode": mode,
        "sheet_px": side * 512,
        "tiles": n_tiles,
        "sheet_seconds": round(dt, 1),
        "tiles_per_sec": round(n_tiles / dt, 3),
    }))


if __name__ == "__main__":
    main()
