"""DDPM ancestral sampler — full-chain `lax.scan` (the LDM ``p_sample_loop`` capability).

The reference's sampling entry points are all DDIM (``DDIMSampler.sample`` /
``model.sample_log``), but the vendored LatentDiffusion also exposes ancestral DDPM
sampling; this completes the schedule-sampler surface. Update rule:

    x_{t-1} = 1/√α_t · (x_t − β_t/√(1−ᾱ_t) · ε̂) + σ_t z,   σ_t² = β̃_t (posterior variance)

with the same batched-2B classifier-free guidance as the DDIM scan.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.core.ddim import DenoiseFn
from topomap_tpu.core.schedules import DiffusionSchedule


def ddpm_sample(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    rng: jax.Array,
    shape: tuple[int, ...],
    cond: Any,
    uncond: Any = None,
    guidance_scale: float = 1.0,
    x_T: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Ancestral sampling over ALL ``sched.num_timesteps`` steps (expensive — DDIM is the
    production path; this exists for parity/diagnostics)."""
    betas = np.asarray(sched.betas)
    alphas = 1.0 - betas
    ab = np.asarray(sched.alphas_cumprod)
    ab_prev = np.asarray(sched.alphas_cumprod_prev)
    posterior_var = betas * (1.0 - ab_prev) / (1.0 - ab)

    betas_j = jnp.asarray(betas)
    alphas_j = jnp.asarray(alphas)
    sqrt_one_minus_ab = sched.sqrt_one_minus_alphas_cumprod
    sigma_j = jnp.asarray(np.sqrt(np.maximum(posterior_var, 0.0)))

    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape, jnp.float32) if x_T is None else x_T
    b = shape[0]

    use_cfg = uncond is not None and guidance_scale != 1.0
    if use_cfg:
        cond2 = jax.tree.map(lambda c, u: jnp.concatenate([c, u], axis=0), cond, uncond)

    def eps_fn(x_t, t_scalar):
        t_b = jnp.full((b,), t_scalar, jnp.int32)
        if not use_cfg:
            return denoise_fn(x_t, t_b, cond)
        eps2 = denoise_fn(
            jnp.concatenate([x_t, x_t], axis=0), jnp.concatenate([t_b, t_b], axis=0), cond2
        )
        return eps2[b:] + guidance_scale * (eps2[:b] - eps2[b:])

    def step(carry, idx):
        x_t, step_rng = carry
        t = sched.num_timesteps - 1 - idx
        eps = eps_fn(x_t, t)
        mean = (x_t - betas_j[t] / sqrt_one_minus_ab[t] * eps) * jax.lax.rsqrt(alphas_j[t])
        step_rng, nr = jax.random.split(step_rng)
        noise = jax.random.normal(nr, x_t.shape, x_t.dtype)
        # no noise at t == 0
        x_prev = mean + jnp.where(t > 0, sigma_j[t], 0.0) * noise
        return (x_prev, step_rng), None

    (x, _), _ = jax.lax.scan(step, (x, rng), jnp.arange(sched.num_timesteps))
    return x
