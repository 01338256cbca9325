"""Few-step consistency sampling (Latent Consistency Models, arXiv:2310.04378).

The reference has no distillation — it pays 2·S model evaluations per tile (S DDIM steps
× cond/uncond CFG, ``vis_metrics.py:408-452``). A consistency-distilled student (trained by
``topomap_tpu.train.distill``) predicts the clean latent directly from any point on the ODE
trajectory with guidance *baked in*, so sampling needs only 1–8 single (CFG-free) model
evaluations. This module is the sampler side: the boundary-scaled consistency function and
the multistep sample loop as one ``lax.scan``.

Parameterization (LCM appendix / diffusers ``LCMScheduler``): the network keeps the
ε-prediction head; the consistency function is

    f(z, t) = c_skip(t)·z + c_out(t)·x0_pred(z, t),
    x0_pred = (z − √(1−ᾱ_t)·ε_θ(z,t)) / √ᾱ_t,

with boundary scalings c_skip(0)=1, c_out(0)=0 so f is the identity at t=0. Multistep
sampling alternates f (denoise to x0 estimate) with a fresh forward-noise jump to the next
lower timestep.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from topomap_tpu.core.schedules import DiffusionSchedule

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray]


def make_consistency_timesteps(num_steps: int, num_train_timesteps: int = 1000):
    """TOP-anchored ascending few-step ladder: ``t_i = round((i+1)·T/S) − 1``.

    The FIRST sampling step must evaluate at ``t ≈ T−1`` — the pure-noise x_T the loop
    starts from only matches the training marginal there. (The DDIM ladder
    ``make_ddim_timesteps`` is bottom-anchored — max ``(S−1)·(T//S)+1`` — which at S=1
    would evaluate f(x_T, t=1) on pure noise and return decoded noise.) S=1 → [999];
    S=4 → [249, 499, 749, 999]; S=50 matches the LCM origin ladder [19, 39, …, 999].
    """
    import numpy as np

    t = num_train_timesteps
    return (np.round(np.arange(1, num_steps + 1) * t / num_steps) - 1).astype(np.int32)


def boundary_scalings(
    t: jnp.ndarray, sigma_data: float = 0.5, timestep_scaling: float = 10.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """LCM boundary-condition scalings ``(c_skip, c_out)`` for discrete timesteps in
    [0, 1000). ``c_skip(0)=1, c_out(0)=0`` (identity at the data boundary); for large t the
    function is dominated by the x0 prediction."""
    s = timestep_scaling * jnp.asarray(t, jnp.float32)
    c_skip = sigma_data**2 / (s**2 + sigma_data**2)
    c_out = s / jnp.sqrt(s**2 + sigma_data**2)
    return c_skip, c_out


def consistency_fn(
    x: jnp.ndarray,
    t: jnp.ndarray,
    eps: jnp.ndarray,
    alphas_cumprod_t: jnp.ndarray,
    sigma_data: float = 0.5,
    timestep_scaling: float = 10.0,
) -> jnp.ndarray:
    """``f(x,t)`` given the model's ε output and the per-element ᾱ_t (broadcastable)."""
    x0 = (x - jnp.sqrt(1.0 - alphas_cumprod_t) * eps) / jnp.sqrt(alphas_cumprod_t)
    c_skip, c_out = boundary_scalings(t, sigma_data, timestep_scaling)
    shape = t.shape + (1,) * (x.ndim - t.ndim)
    return c_skip.reshape(shape) * x + c_out.reshape(shape) * x0


def consistency_sample(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    num_steps: int,
    rng: jax.Array,
    shape: tuple[int, ...],
    cond: Any,
    sigma_data: float = 0.5,
    timestep_scaling: float = 10.0,
    x_T: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Multistep consistency sampling: ``num_steps`` SINGLE model evaluations total.

    ``denoise_fn(x, t[B], cond) -> eps`` is the CFG-free distilled student. Timesteps are
    the TOP-anchored uniform ladder (descending from ``T−1``); each step maps the current
    latent to an x0 estimate via ``f`` and re-noises it to the next lower timestep with
    FRESH noise (LCM multistep; the last step returns ``f`` directly).
    """
    ts = jnp.asarray(make_consistency_timesteps(num_steps, sched.num_timesteps), jnp.int32)
    ab = sched.alphas_cumprod
    b = shape[0]

    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape, jnp.float32) if x_T is None else x_T

    def step(carry, idx):
        x_t, step_rng = carry
        i = num_steps - 1 - idx  # descending through the ladder
        t = ts[i]
        t_b = jnp.full((b,), t, jnp.int32)
        eps = denoise_fn(x_t, t_b, cond)
        denoised = consistency_fn(
            x_t, t_b, eps, ab[t], sigma_data=sigma_data, timestep_scaling=timestep_scaling
        )
        # re-noise to the next lower ladder point (no-op on the final step)
        t_next = ts[jnp.maximum(i - 1, 0)]
        step_rng, noise_rng = jax.random.split(step_rng)
        noise = jax.random.normal(noise_rng, x_t.shape, x_t.dtype)
        renoised = jnp.sqrt(ab[t_next]) * denoised + jnp.sqrt(1.0 - ab[t_next]) * noise
        x_next = jnp.where(idx == num_steps - 1, denoised, renoised)
        return (x_next, step_rng), None

    (x, _), _ = jax.lax.scan(step, (x, rng), jnp.arange(num_steps))
    return x
