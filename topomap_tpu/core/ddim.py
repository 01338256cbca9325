"""Jitted DDIM sampler: the whole denoising trajectory is ONE ``lax.scan``.

The reference samples with the vendored ``DDIMSampler.sample`` — a Python ``for`` loop that
launches two ``model.apply_model`` calls per step (cond + uncond CFG), one tile at a time
(see SURVEY.md §3.2; reference ``TextEncoder_Finetuning/vis_metrics.py:408-452`` and
``BaseModel/evaluateCN.py:93-96``). On TPU that structure wastes the chip twice over: the
Python loop re-dispatches per step, and the two CFG branches are independent batches.

Here the trajectory compiles to a single ``lax.scan`` whose body runs cond and uncond through
the model **in one batched forward pass** (batch ``2B``), so XLA pipelines the whole thing and
the MXU sees one large batch. Sampling a full 10×10 map sheet is then just ``B=100``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.core.schedules import DiffusionSchedule, make_ddim_timesteps

# denoise_fn(x_t [B,H,W,C], t [B] int32, cond pytree) -> eps [B,H,W,C]
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    num_steps: int = 20
    guidance_scale: float = 9.0
    eta: float = 0.0
    # When True (default), run cond+uncond as one 2B-batched model call per scan step.
    parallel_cfg: bool = True
    # Opt-in speed knob: refresh the UNCONDITIONAL epsilon only every `cfg_interval`-th
    # step and reuse the stale one in between (lazy-CFG; related to encoder-reuse tricks,
    # cf. "Faster Diffusion" arXiv:2312.09608). 1 = exact reference CFG; 2 cuts model
    # evaluations by 25%.
    cfg_interval: int = 1
    # Opt-in DeepCache (arXiv:2312.00858): re-run the deep UNet+ControlNet trunk only every
    # k-th step, recomputing just the full-resolution level in between. 1 = exact. Requires
    # the caller to pass `denoise_cached`/`cache0` to ddim_sample (pipeline.sample does).
    deep_cache_interval: int = 1
    # lax.scan unroll factor for the denoising loop (compile-time pipelining experiment;
    # semantics identical, trades compile time/code size for scheduler freedom). 1 = off.
    unroll: int = 1
    # CFG shared-prefix fork (exact): under parallel CFG both halves share x_t/t/hint, so
    # everything before the FIRST cross-attention (conv_in, the first res-block and the
    # expensive full-resolution self-attention — of the UNet AND the ControlNet copy) is
    # computed once at batch B; hidden states duplicate to 2B only where the contexts
    # diverge (models.attention.transformer_block). Bit-exact by construction; callers
    # (pipeline.sample) build the forked conditioning and pass it as ``cond_fork2``.
    cfg_fork: bool = False
    # "ddim" (reference semantics) or "dpm" (DPM-Solver++(2M), core/dpm_solver.py):
    # second-order ODE solver — 50-step-DDIM quality at ~15-20 evals, exact model math.
    # "dpm" is deterministic (eta ignored) and excludes cfg_interval/deep_cache_interval.
    solver: str = "ddim"


def guess_mode_control_scales(strength: float = 1.0, n: int = 13) -> jnp.ndarray:
    """ControlNet "guess mode" residual scaling ``strength * 0.825**(12-i)``.

    Reference: ``BaseModel/evaluateCN.py:91``. Index 0 is the outermost (highest-res)
    zero-conv residual; index 12 the middle block.
    """
    return jnp.asarray([strength * (0.825 ** float(n - 1 - i)) for i in range(n)], jnp.float32)


def _ddim_tables(sched: DiffusionSchedule, num_steps: int, eta: float):
    """Per-DDIM-step (ascending) alpha / alpha_prev / sigma tables as numpy constants."""
    ts = make_ddim_timesteps(num_steps, sched.num_timesteps)
    ab = np.asarray(sched.alphas_cumprod)
    alphas = ab[ts]
    alphas_prev = np.concatenate([[float(ab[0])], ab[ts[:-1]]])
    sigmas = eta * np.sqrt(
        (1.0 - alphas_prev) / (1.0 - alphas) * (1.0 - alphas / alphas_prev)
    )
    return (
        jnp.asarray(ts, jnp.int32),
        jnp.asarray(alphas, jnp.float32),
        jnp.asarray(alphas_prev, jnp.float32),
        jnp.asarray(sigmas, jnp.float32),
    )


def _ddim_update(x_t, eps, a_t, a_prev, sigma, step_rng):
    """One DDIM x-update (the LDM ``p_sample_ddim`` math), shared by the exact and
    deep-cache scan bodies. Returns (x_prev, advanced rng)."""
    pred_x0 = (x_t - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
    step_rng, noise_rng = jax.random.split(step_rng)
    noise = sigma * jax.random.normal(noise_rng, x_t.shape, x_t.dtype)
    return jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise, step_rng


def ddim_sample(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    cfg: DDIMConfig,
    rng: jax.Array,
    shape: tuple[int, ...],
    cond: Any,
    uncond: Any,
    x_T: jnp.ndarray | None = None,
    denoise_cached=None,
    cache0: Any = None,
    cond_fork2: Any = None,
) -> jnp.ndarray:
    """Sample latents ``x_0`` of ``shape`` = [B, H, W, C] with classifier-free guidance.

    ``cond`` / ``uncond`` are arbitrary pytrees with identical structure whose leaves have a
    leading batch dim B (e.g. ``{"crossattn": [B,77,768], "concat": [B,512,512,3]}``). The
    reference's unconditional embedding is a ZERO tensor, not an encoded empty prompt
    (``vis_metrics.py:425``) — callers construct that themselves.

    Returns the final latent; decode with the VAE afterwards.
    """
    ts, alphas, alphas_prev, sigmas = _ddim_tables(sched, cfg.num_steps, cfg.eta)

    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape, jnp.float32) if x_T is None else x_T
    b = shape[0]

    if cfg.parallel_cfg:
        cond2 = jax.tree.map(lambda c, u: jnp.concatenate([c, u], axis=0), cond, uncond)

    if cfg.deep_cache_interval > 1:
        # DeepCache mode: denoise_cached(x, t, cond, cache, refresh) -> (eps, cache).
        # Supported with the 2B-batched parallel CFG (or no guidance); orthogonal lazy-CFG
        # is not combined with it.
        assert denoise_cached is not None and cache0 is not None, (
            "deep_cache_interval > 1 needs denoise_cached/cache0 (see pipeline.sample)"
        )
        assert cfg.cfg_interval == 1, "deep_cache_interval and cfg_interval are exclusive"
        assert cfg.guidance_scale == 1.0 or cfg.parallel_cfg, (
            "deep cache with guidance needs parallel_cfg"
        )

        def step_dc(carry, idx):
            x_t, cache, step_rng = carry
            i = cfg.num_steps - 1 - idx
            refresh = (idx % cfg.deep_cache_interval) == 0
            t_b = jnp.full((b,), ts[i], jnp.int32)
            if cfg.guidance_scale == 1.0:
                eps, cache = denoise_cached(x_t, t_b, cond, cache, refresh)
            elif cond_fork2 is not None:
                # shared-prefix fork: batch-B latents, 2B contexts (see DDIMConfig.cfg_fork)
                eps2, cache = denoise_cached(x_t, t_b, cond_fork2, cache, refresh)
            else:
                eps2, cache = denoise_cached(
                    jnp.concatenate([x_t, x_t], axis=0),
                    jnp.concatenate([t_b, t_b], axis=0),
                    cond2,
                    cache,
                    refresh,
                )
            if cfg.guidance_scale != 1.0:
                eps_c, eps_u = eps2[:b], eps2[b:]
                eps = eps_u + cfg.guidance_scale * (eps_c - eps_u)
            x_prev, step_rng = _ddim_update(
                x_t, eps, alphas[i], alphas_prev[i], sigmas[i], step_rng
            )
            return (x_prev, cache, step_rng), None

        (x, _, _), _ = jax.lax.scan(step_dc, (x, cache0, rng), jnp.arange(cfg.num_steps),
                                unroll=cfg.unroll)
        return x

    def model_eps(x_t, t_scalar, eps_u_prev, refresh):
        """Returns (guided eps, eps_u for the carry)."""
        t_b = jnp.full((b,), t_scalar, jnp.int32)
        if cfg.guidance_scale == 1.0:
            e = denoise_fn(x_t, t_b, cond)
            return e, e
        if cfg.cfg_interval > 1:
            # Lazy CFG: fresh cond every step; uncond only on refresh steps.
            eps_c = denoise_fn(x_t, t_b, cond)
            eps_u = jax.lax.cond(
                refresh,
                lambda: denoise_fn(x_t, t_b, uncond),
                lambda: eps_u_prev,
            )
        elif cfg.parallel_cfg:
            if cond_fork2 is not None:
                # shared-prefix fork: batch-B latents, 2B contexts (DDIMConfig.cfg_fork)
                eps2 = denoise_fn(x_t, t_b, cond_fork2)
            else:
                eps2 = denoise_fn(
                    jnp.concatenate([x_t, x_t], axis=0),
                    jnp.concatenate([t_b, t_b], axis=0),
                    cond2,
                )
            eps_c, eps_u = eps2[:b], eps2[b:]
        else:
            eps_c = denoise_fn(x_t, t_b, cond)
            eps_u = denoise_fn(x_t, t_b, uncond)
        return eps_u + cfg.guidance_scale * (eps_c - eps_u), eps_u

    def step(carry, idx):
        # idx runs 0..S-1 over REVERSED step order (t descending).
        x_t, eps_u_prev, step_rng = carry
        i = cfg.num_steps - 1 - idx
        refresh = (idx % cfg.cfg_interval) == 0
        eps, eps_u = model_eps(x_t, ts[i], eps_u_prev, refresh)
        x_prev, step_rng = _ddim_update(
            x_t, eps, alphas[i], alphas_prev[i], sigmas[i], step_rng
        )
        return (x_prev, eps_u, step_rng), None

    eps_u0 = jnp.zeros(shape, jnp.float32)
    (x, _, _), _ = jax.lax.scan(step, (x, eps_u0, rng), jnp.arange(cfg.num_steps),
                                unroll=cfg.unroll)
    return x
