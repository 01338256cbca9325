"""Full-scale distillation sanity on the real TPU chip.

Runs guidance distillation (train/distill.py) of the REAL config-3 SD1.5 topology at 512²
— simulated-pretrained teacher, rank-16 qkvo student adapters — and logs the distillation
loss trajectory to ``runs/distill512_guidance/loss_log.json`` (reference schema). The
initial loss is the amplified CFG gap ``(w−1)²·E||ε_c−ε_u||²``; a decreasing trajectory
demonstrates the student adapters absorbing the guidance signal at production scale.

Usage:  python tools/distill512_check.py  [STEPS=200 SCAN=20 BATCH=2 via env]
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from topomap_tpu.core import make_schedule
    from topomap_tpu.lora import LoRASpec
    from topomap_tpu.ops.flash_attention import best_attention_fn
    from topomap_tpu.pipeline import PipelineConfig, make_tokenizers
    from topomap_tpu.train.distill import (
        DistillConfig,
        init_distill_state,
        make_distill_step,
        prepare_student,
    )
    from topomap_tpu.train.optim import OptimConfig, build_optimizer
    from topomap_tpu.train.trainer import make_train_scan

    steps = int(os.environ.get("STEPS", "200"))
    scan_steps = int(os.environ.get("SCAN", "20"))
    batch = int(os.environ.get("BATCH", "2"))
    size = int(os.environ.get("SIZE", "512"))
    mode = os.environ.get("MODE", "guidance")  # guidance | consistency

    cfg = PipelineConfig.sd15_config3()
    sched = make_schedule(cfg.num_train_timesteps)
    dcfg = DistillConfig(mode=mode, lora=LoRASpec.qkvo(16))

    print("init params on host cpu...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    from _distill_common import cpu_ctx, init_base

    _, _ctx = cpu_ctx()
    params, provenance = init_base(cfg)
    with _ctx:
        params = prepare_student(params, cfg, dcfg, jax.random.PRNGKey(2))
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(jax.tree.leaves(params)[0])
    print(f"params ready in {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    tx, part = build_optimizer(
        params, OptimConfig("distill", total_steps=steps, warmup=max(1, steps // 10))
    )
    state = init_distill_state(params, tx, part)
    step_fn = jax.jit(
        make_train_scan(
            make_distill_step(cfg, sched, tx, part, dcfg, attn_fn=best_attention_fn(),
                              remat=True),
            scan_steps,
        ),
        donate_argnums=0,
    )

    tok, _ = make_tokenizers(cfg)
    prompts = ["Set Forest color to dark green", "Render Road as a dashed line pattern"]
    ids, mask = tok.encode((prompts * batch)[:batch])
    # one fixed synthetic tile pair (overfit-style sanity, like runs/overfit512_config3)
    import numpy as np

    rng_np = np.random.default_rng(0)
    seg_np = rng_np.random((batch, size, size, 3), dtype=np.float32)
    gt_np = rng_np.random((batch, size, size, 3), dtype=np.float32) * 2.0 - 1.0
    batch_d = {
        "seg": jnp.tile(jnp.asarray(seg_np)[None], (scan_steps, 1, 1, 1, 1)),
        "gt": jnp.tile(jnp.asarray(gt_np)[None], (scan_steps, 1, 1, 1, 1)),
        "ids": jnp.tile(jnp.asarray(ids)[None], (scan_steps, 1, 1)),
        "mask": jnp.tile(jnp.asarray(mask)[None], (scan_steps, 1, 1)),
    }

    # fixed-seed distill-val: student-vs-teacher-CFG gap on a fixed (t, noise) grid —
    # the train loss is dominated by per-step t variance, this is the clean signal
    from topomap_tpu.pipeline import apply_model, encode_text
    from topomap_tpu.models.vae import vae_encode, vae_sample_latent
    from topomap_tpu.core import q_sample
    from topomap_tpu.train.distill import teacher_view

    attn = best_attention_fn()

    def distill_val(params, vb):
        # vb passed as arguments, NOT captured: closure constants of this size blow the
        # remote-compile request limit (HTTP 413)
        vr = jax.random.PRNGKey(12345)
        c = encode_text(params, cfg, vb["ids"], vb["mask"])
        mean, logvar = vae_encode(params["vae"], cfg.vae, vb["gt"])
        z0 = vae_sample_latent(jax.random.fold_in(vr, 0), mean, logvar, cfg.vae.scale_factor)
        cond = {"crossattn": c, "concat": vb["seg"]}
        uncond = {"crossattn": jnp.zeros_like(c), "concat": vb["seg"]}
        tp = teacher_view(params)

        if mode == "consistency":
            # fixed-seed SELF-consistency residual: f(z_hi,t_hi) vs f(ẑ_lo,t_lo) where
            # ẑ_lo is one guided teacher DDIM step down — shrinks as f converges to a
            # true consistency function of the teacher ODE
            from topomap_tpu.core.consistency import consistency_fn, make_consistency_timesteps
            from topomap_tpu.core.schedules import _extract

            # top-anchored ladder, matching make_consistency_distill_step's training ladder
            ladder = jnp.asarray(
                make_consistency_timesteps(dcfg.teacher_steps, sched.num_timesteps), jnp.int32
            )
            ab = sched.alphas_cumprod

            def body(i, acc):
                r = jax.random.fold_in(vr, i + 1)
                n = 5 + i * 10
                t_hi = jnp.full((z0.shape[0],), ladder[n], jnp.int32)
                t_lo = jnp.full((z0.shape[0],), ladder[n - 1], jnp.int32)
                a_hi = _extract(ab, t_hi, z0.ndim)
                a_lo = _extract(ab, t_lo, z0.ndim)
                noise = jax.random.normal(r, z0.shape)
                z_hi = q_sample(sched, z0, t_hi, noise)
                e2 = apply_model(
                    tp, cfg,
                    jnp.concatenate([z_hi, z_hi]), jnp.concatenate([t_hi, t_hi]),
                    jax.tree.map(lambda a, b: jnp.concatenate([a, b]), cond, uncond),
                    attn_fn=attn,
                )
                b_ = z0.shape[0]
                eps_t = e2[b_:] + dcfg.guidance_scale * (e2[:b_] - e2[b_:])
                x0_t = (z_hi - jnp.sqrt(1.0 - a_hi) * eps_t) / jnp.sqrt(a_hi)
                z_lo = jnp.sqrt(a_lo) * x0_t + jnp.sqrt(1.0 - a_lo) * eps_t
                f_hi = consistency_fn(
                    z_hi, t_hi, apply_model(params, cfg, z_hi, t_hi, cond, attn_fn=attn),
                    a_hi, dcfg.sigma_data, dcfg.timestep_scaling,
                )
                f_lo = consistency_fn(
                    z_lo, t_lo, apply_model(params, cfg, z_lo, t_lo, cond, attn_fn=attn),
                    a_lo, dcfg.sigma_data, dcfg.timestep_scaling,
                )
                return acc + jnp.mean((f_hi - f_lo) ** 2)

            return jax.lax.fori_loop(0, 4, body, 0.0) / 4

        def body(i, acc):
            r = jax.random.fold_in(vr, i + 1)
            t = jnp.full((z0.shape[0],), 100 + i * 200, jnp.int32)
            noise = jax.random.normal(r, z0.shape)
            z_t = q_sample(sched, z0, t, noise)
            e2 = apply_model(
                tp, cfg,
                jnp.concatenate([z_t, z_t]), jnp.concatenate([t, t]),
                jax.tree.map(lambda a, b: jnp.concatenate([a, b]), cond, uncond),
                attn_fn=attn,
            )
            b_ = z0.shape[0]
            tgt = e2[b_:] + dcfg.guidance_scale * (e2[:b_] - e2[b_:])
            eps_s = apply_model(params, cfg, z_t, t, cond, attn_fn=attn)
            return acc + jnp.mean((eps_s - tgt) ** 2)

        return jax.lax.fori_loop(0, 5, body, 0.0) / 5

    _val_jit = jax.jit(distill_val)
    val_batch = {k: batch_d[k][0] for k in ("seg", "gt", "ids", "mask")}
    val_fn = lambda p: _val_jit(p, val_batch)

    out_dir = Path(__file__).resolve().parent.parent / "runs" / f"distill512_{mode}"
    out_dir.mkdir(parents=True, exist_ok=True)
    log = {"step": [], "train_mse": [], "ema": [], "val_step": [], "val_mse": [],
           "val_l1": [], "val_ssim": []}
    ema, beta, count = 0.0, 0.98, 0

    rng = jax.random.PRNGKey(7)
    print("compiling...", file=sys.stderr, flush=True)
    n_scans = (steps + scan_steps - 1) // scan_steps
    val_every = max(1, n_scans // 8)
    t_all = time.perf_counter()
    v0 = float(val_fn(state.params))
    log["val_step"].append(0)
    log["val_mse"].append(v0)
    print(f"val[0] {v0:.4f}", file=sys.stderr, flush=True)
    for i in range(n_scans):
        t0 = time.perf_counter()
        state, m = step_fn(state, batch_d, jax.random.fold_in(rng, i))
        losses = [float(x) for x in jax.device_get(m["loss"])]
        dt = time.perf_counter() - t0
        for j, l in enumerate(losses):
            count += 1
            ema = beta * ema + (1 - beta) * l
            log["step"].append(i * scan_steps + j + 1)
            log["train_mse"].append(l)
            log["ema"].append(ema / (1 - beta**count))
        print(f"scan {i}: steps {i*scan_steps+1}-{(i+1)*scan_steps} "
              f"first/last loss {losses[0]:.4f}/{losses[-1]:.4f} "
              f"({dt:.1f}s, {scan_steps/dt:.2f} steps/s)", file=sys.stderr, flush=True)
        if (i + 1) % val_every == 0 or i == n_scans - 1:
            v = float(val_fn(state.params))
            log["val_step"].append((i + 1) * scan_steps)
            log["val_mse"].append(v)
            print(f"val[{(i+1)*scan_steps}] {v:.4f}", file=sys.stderr, flush=True)
        (out_dir / "loss_log.json").write_text(json.dumps(log))
    total = time.perf_counter() - t_all
    print(json.dumps({
        "initial_val": log["val_mse"][0],
        "final_val": log["val_mse"][-1],
        "final_ema": log["ema"][-1],
        "steps": len(log["step"]),
        "wall_s": round(total, 1),
        "base": provenance,
    }))


if __name__ == "__main__":
    main()
