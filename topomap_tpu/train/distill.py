"""Distillation trainers: CFG-free ("guidance") and few-step ("consistency") students.

The reference's sampling cost is 2·S model evaluations per tile (S DDIM steps × cond/uncond
CFG — ``vis_metrics.py:408-452``, ``evaluateCN.py:93-96``); it has no distillation machinery
of any kind. On TPU the exact-CFG speed-of-light for this workload is ~3.6 tiles/s/chip
(BENCH_NOTES.md) — reaching the 8 tiles/s north star requires FEWER evaluations, which is an
algorithmic (training-time) change. This module implements both standard recipes:

* **Guidance distillation** (Meng & Salimans, arXiv:2210.03142): a student learns
  ``ε_s(z,t,c) ≈ ε_u + w·(ε_c − ε_u)`` from the frozen CFG teacher. Sampling then needs ONE
  model call per DDIM step instead of two — a 2× cut at identical step count.
* **Consistency distillation** (LCM, arXiv:2310.04378): the student learns the
  boundary-scaled consistency function of the teacher's guided probability-flow ODE,
  enabling 1–8-step sampling via ``topomap_tpu.core.consistency.consistency_sample`` —
  up to ~25× fewer evaluations than the reference's 50-step CFG loop.

Both students are **LoRA-parameterized** on top of the (merged) teacher trunk (LCM-LoRA,
arXiv:2311.05556): ``prepare_student`` folds any trained task-LoRA into the base weights and
attaches fresh zero-init distillation adapters, so (a) the student is exactly the teacher at
init, (b) only ~10⁷ params train (ParamPartition keeps grads/optimizer state small), and
(c) ONE trunk lives in HBM — the teacher forward is the same tree with the adapter trees
simply not passed.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from topomap_tpu.core import DiffusionSchedule, q_sample
from topomap_tpu.core.consistency import consistency_fn, make_consistency_timesteps
from topomap_tpu.core.schedules import _extract
from topomap_tpu.lora import LoRASpec, build_lora_tree
from topomap_tpu.pipeline import PipelineConfig, apply_model, encode_text, merge_for_sampling
from topomap_tpu.train.optim import ParamPartition, distill_labeler  # noqa: F401 (re-export)
from topomap_tpu.models.vae import vae_encode, vae_sample_latent

Params = dict[str, Any]

# Collections the teacher forward ignores: the distillation adapters.
_STUDENT_ONLY = ("unet_lora", "ctrl_lora")


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    mode: str = "guidance"  # "guidance" | "consistency"
    guidance_scale: float = 7.5  # the w baked into the student (reference eval scales: 7.5/9)
    lora: LoRASpec = LoRASpec.qkvo(16)
    # consistency mode: teacher ODE ladder (uniform DDIM subset) and skip interval
    teacher_steps: int = 50
    skip: int = 1
    ema_decay: float = 0.95
    sigma_data: float = 0.5
    timestep_scaling: float = 10.0
    loss: str = "mse"  # "mse" | "huber" (pseudo-Huber, LCM-style)
    huber_c: float = 0.001


def prepare_student(params: Params, cfg: PipelineConfig, dcfg: DistillConfig, key) -> Params:
    """Teacher+student bundle from a trained pipeline tree.

    Folds any existing task-LoRA into the trunk (``merge_for_sampling`` — the distilled
    teacher is the DEPLOYED model, adapters included), then attaches fresh zero-init
    distillation LoRA as ``unet_lora``/``ctrl_lora``. Because LoRA-B is zero at init, the
    student's first forward is bit-identical to the teacher's.
    """
    out = merge_for_sampling(params)
    k1, k2 = jax.random.split(key)
    out["unet_lora"] = build_lora_tree(out["unet"], dcfg.lora, k1)
    out["ctrl_lora"] = build_lora_tree(out["controlnet"], dcfg.lora, k2)
    return out


def teacher_view(params: Params) -> Params:
    """The same tree without the student adapters — the frozen teacher forward."""
    return {k: v for k, v in params.items() if k not in _STUDENT_ONLY}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DistillState:
    params: Params
    ema: list  # EMA of the trainable (student-adapter) leaves, flat like partition.extract
    opt_state: Any
    step: jnp.ndarray


def init_distill_state(
    params: Params, tx: optax.GradientTransformation, partition: ParamPartition
) -> DistillState:
    train = partition.extract(params)
    return DistillState(
        params=params,
        # real copies, NOT views: params and ema leaves must be distinct buffers or
        # donation of the state (donate_argnums=0 scan dispatch) sees the same buffer twice
        ema=[jnp.array(x, copy=True) for x in train],
        opt_state=tx.init(train),
        step=jnp.asarray(0, jnp.int32),
    )


def _distill_loss(pred: jnp.ndarray, target: jnp.ndarray, dcfg: DistillConfig) -> jnp.ndarray:
    d = pred - target
    if dcfg.loss == "huber":
        return jnp.mean(jnp.sqrt(d * d + dcfg.huber_c**2) - dcfg.huber_c)
    return jnp.mean(d * d)


def _teacher_cfg_eps(
    params: Params,
    cfg: PipelineConfig,
    z: jnp.ndarray,
    t: jnp.ndarray,
    cond: dict,
    uncond: dict,
    w: float,
    attn_fn,
) -> jnp.ndarray:
    """One 2B-batched cond/uncond teacher pass → guided ε (stop-gradient)."""
    tp = teacher_view(params)
    z2 = jnp.concatenate([z, z], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    c2 = jax.tree.map(lambda c, u: jnp.concatenate([c, u], axis=0), cond, uncond)
    eps2 = apply_model(tp, cfg, z2, t2, c2, attn_fn=attn_fn)
    b = z.shape[0]
    eps_c, eps_u = eps2[:b], eps2[b:]
    return jax.lax.stop_gradient(eps_u + w * (eps_c - eps_u))


def _encode_batch(params: Params, cfg: PipelineConfig, batch, rng_vae):
    """Frozen text + VAE encodes shared by both distillation modes."""
    c = jax.lax.stop_gradient(encode_text(params, cfg, batch["ids"], batch["mask"]))
    mean, logvar = vae_encode(params["vae"], cfg.vae, batch["gt"])
    z0 = jax.lax.stop_gradient(
        vae_sample_latent(rng_vae, mean, logvar, cfg.vae.scale_factor)
    )
    cond = {"crossattn": c, "concat": batch["seg"]}
    uncond = {"crossattn": jnp.zeros_like(c), "concat": batch["seg"]}
    return z0, cond, uncond


def make_guidance_distill_step(
    cfg: PipelineConfig,
    sched: DiffusionSchedule,
    tx: optax.GradientTransformation,
    partition: ParamPartition,
    dcfg: DistillConfig,
    attn_fn=None,
    remat: bool = False,
) -> Callable:
    """Jitted guidance-distillation step: ``min_s || ε_s(z_t,t,c) − ε_cfg_teacher ||²``.

    Batch schema matches the train step (``{"seg","gt","ids","mask"}``). Random t per
    element over the full 1000-step range (the student stays a drop-in ε-model usable by
    the standard DDIM sampler at ``guidance_scale=1.0``).
    """

    from topomap_tpu.ops.flash_attention import best_attention_fn
    attn_fn = attn_fn or best_attention_fn()

    def step_fn(state: DistillState, batch, rng):
        rng_vae, rng_t, rng_noise = jax.random.split(jax.random.fold_in(rng, state.step), 3)
        z0, cond, uncond = _encode_batch(state.params, cfg, batch, rng_vae)
        b = z0.shape[0]
        t = jax.random.randint(rng_t, (b,), 0, sched.num_timesteps)
        noise = jax.random.normal(rng_noise, z0.shape)
        z_t = q_sample(sched, z0, t, noise)
        target = _teacher_cfg_eps(
            state.params, cfg, z_t, t, cond, uncond, dcfg.guidance_scale, attn_fn
        )

        def loss_fn(train_leaves):
            params = partition.combine(state.params, train_leaves)
            eps_s = apply_model(params, cfg, z_t, t, cond, attn_fn=attn_fn, remat=remat)
            return _distill_loss(eps_s, target, dcfg)

        train = partition.extract(state.params)
        loss, grads = jax.value_and_grad(loss_fn)(train)
        updates, opt_state = tx.update(grads, state.opt_state, train)
        new_train = optax.apply_updates(train, updates)
        d = dcfg.ema_decay
        ema = [d * e + (1.0 - d) * n for e, n in zip(state.ema, new_train)]
        new_state = DistillState(
            params=partition.combine(state.params, new_train),
            ema=ema,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, {"loss": loss}

    return step_fn


def make_consistency_distill_step(
    cfg: PipelineConfig,
    sched: DiffusionSchedule,
    tx: optax.GradientTransformation,
    partition: ParamPartition,
    dcfg: DistillConfig,
    attn_fn=None,
    remat: bool = False,
) -> Callable:
    """Jitted LCM-style consistency-distillation step.

    Per element: pick adjacent(-ish) points ``t_lo < t_hi`` on the teacher's uniform DDIM
    ladder, noise the data latent to ``t_hi``, run ONE guided teacher DDIM step (η=0) down
    to ``t_lo``, and regress the student's consistency output at ``(z_hi, t_hi)`` onto the
    EMA student's output at ``(ẑ_lo, t_lo)`` (stop-gradient). Self-consistency plus the
    c_skip/c_out boundary condition pins f(·,0)=identity, so the student chains backward to
    a denoiser usable at 1–8 steps.
    """

    from topomap_tpu.ops.flash_attention import best_attention_fn
    attn_fn = attn_fn or best_attention_fn()
    # TOP-anchored teacher ladder (max element = T-1), matching the inference ladder of
    # ``make_consistency_timesteps`` — bottom-anchored DDIM steps would leave every
    # sampling timestep (critically the t=T-1 first step on pure noise) off the training
    # distribution (LCM trains on [19,...,999] and samples a subset of it).
    ladder = jnp.asarray(
        make_consistency_timesteps(dcfg.teacher_steps, sched.num_timesteps), jnp.int32
    )
    ab = sched.alphas_cumprod

    def step_fn(state: DistillState, batch, rng):
        rng_vae, rng_n, rng_noise = jax.random.split(jax.random.fold_in(rng, state.step), 3)
        z0, cond, uncond = _encode_batch(state.params, cfg, batch, rng_vae)
        b = z0.shape[0]
        n = jax.random.randint(rng_n, (b,), dcfg.skip, dcfg.teacher_steps)
        t_hi = ladder[n]
        t_lo = ladder[n - dcfg.skip]
        a_hi = _extract(ab, t_hi, z0.ndim)
        a_lo = _extract(ab, t_lo, z0.ndim)

        noise = jax.random.normal(rng_noise, z0.shape)
        z_hi = q_sample(sched, z0, t_hi, noise)

        # one guided teacher DDIM step t_hi -> t_lo (eta=0)
        eps_t = _teacher_cfg_eps(
            state.params, cfg, z_hi, t_hi, cond, uncond, dcfg.guidance_scale, attn_fn
        )
        x0_t = (z_hi - jnp.sqrt(1.0 - a_hi) * eps_t) / jnp.sqrt(a_hi)
        z_lo = jnp.sqrt(a_lo) * x0_t + jnp.sqrt(1.0 - a_lo) * eps_t

        # EMA-student target at (z_lo, t_lo)
        params_ema = partition.combine(state.params, state.ema)
        eps_e = apply_model(params_ema, cfg, z_lo, t_lo, cond, attn_fn=attn_fn)
        target = jax.lax.stop_gradient(
            consistency_fn(z_lo, t_lo, eps_e, a_lo, dcfg.sigma_data, dcfg.timestep_scaling)
        )

        def loss_fn(train_leaves):
            params = partition.combine(state.params, train_leaves)
            eps_s = apply_model(params, cfg, z_hi, t_hi, cond, attn_fn=attn_fn, remat=remat)
            f_s = consistency_fn(
                z_hi, t_hi, eps_s, a_hi, dcfg.sigma_data, dcfg.timestep_scaling
            )
            return _distill_loss(f_s, target, dcfg)

        train = partition.extract(state.params)
        loss, grads = jax.value_and_grad(loss_fn)(train)
        updates, opt_state = tx.update(grads, state.opt_state, train)
        new_train = optax.apply_updates(train, updates)
        d = dcfg.ema_decay
        ema = [d * e + (1.0 - d) * n_ for e, n_ in zip(state.ema, new_train)]
        new_state = DistillState(
            params=partition.combine(state.params, new_train),
            ema=ema,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, {"loss": loss}

    return step_fn


def make_distill_step(cfg, sched, tx, partition, dcfg: DistillConfig, **kw) -> Callable:
    if dcfg.mode == "guidance":
        return make_guidance_distill_step(cfg, sched, tx, partition, dcfg, **kw)
    if dcfg.mode == "consistency":
        return make_consistency_distill_step(cfg, sched, tx, partition, dcfg, **kw)
    raise ValueError(f"unknown distill mode {dcfg.mode!r}")
