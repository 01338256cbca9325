"""DDPM noise schedules and forward-process math.

TPU-native rewrite of the schedule machinery the reference inherits from the vendored
LDM/ControlNet stack (``model.q_sample`` / ``model.predict_start_from_noise``, used at e.g.
``LoRA_modified/multiseg_19prompts_batch1_shuffle_addlrSD.py:442-444`` and
``multiseg_colorprompts_addlrSD_maskloss.py:567-583`` in the reference repo).

Everything here is pure, static-shaped jnp — the schedule tables are precomputed once on the
host in float64-ish precision (float32 accumulation; alpha-bar products computed with cumsum of
logs for stability) and closed over by jitted train/sample steps.

Stable Diffusion v1.5 defaults: 1000 training timesteps, "scaled-linear" (sqrt-linear) betas
from 0.00085 to 0.012.
"""
from __future__ import annotations

import dataclasses
from typing import Literal

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed forward-process tables, all shape ``[num_timesteps]`` float32."""

    num_timesteps: int
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    # v-prediction support (not used by the reference configs, which are all eps-pred,
    # but part of the SD1.x capability surface).
    linear_start: float = 0.00085
    linear_end: float = 0.012


def _make_betas(
    num_timesteps: int,
    schedule: Literal["scaled_linear", "linear", "cosine"],
    linear_start: float,
    linear_end: float,
) -> np.ndarray:
    if schedule == "scaled_linear":
        # SD convention: linear in sqrt(beta) space.
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, num_timesteps, dtype=np.float64)
            ** 2
        )
    elif schedule == "linear":
        betas = np.linspace(linear_start, linear_end, num_timesteps, dtype=np.float64)
    elif schedule == "cosine":
        s = 0.008
        steps = np.arange(num_timesteps + 1, dtype=np.float64) / num_timesteps
        f = np.cos((steps + s) / (1 + s) * np.pi / 2) ** 2
        alphas_bar = f / f[0]
        betas = np.clip(1.0 - alphas_bar[1:] / alphas_bar[:-1], 0.0, 0.999)
    else:  # pragma: no cover - guarded by Literal
        raise ValueError(f"unknown beta schedule: {schedule}")
    return betas


def make_schedule(
    num_timesteps: int = 1000,
    schedule: Literal["scaled_linear", "linear", "cosine"] = "scaled_linear",
    linear_start: float = 0.00085,
    linear_end: float = 0.012,
) -> DiffusionSchedule:
    """Build the DDPM forward-process tables (float64 on host, stored float32)."""
    betas = _make_betas(num_timesteps, schedule, linear_start, linear_end)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        num_timesteps=num_timesteps,
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        linear_start=linear_start,
        linear_end=linear_end,
    )


def _extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and broadcast to an ``ndim``-rank batch tensor."""
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def q_sample(
    sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Forward diffusion: ``x_t = sqrt(ab_t) x_0 + sqrt(1-ab_t) eps``.

    Mirrors the LDM ``q_sample`` the reference training loops call per step
    (``multiseg_19prompts_batch1_shuffle_addlrSD.py:442-444``).
    """
    return (
        _extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + _extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def predict_start_from_noise(
    sched: DiffusionSchedule, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Invert the forward process: ``x_0 = sqrt(1/ab_t) x_t − sqrt(1/ab_t − 1) eps``.

    Used by the masked-color loss (reference ``multiseg_colorprompts_addlrSD_maskloss.py:567``)
    and inside the DDIM update.
    """
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
    )


def make_ddim_timesteps(
    num_ddim_steps: int, num_train_timesteps: int = 1000, method: str = "uniform"
) -> np.ndarray:
    """Uniform-stride DDIM timestep subset, ascending, as used by the vendored DDIMSampler.

    LDM's "uniform" discretization: ``range(0, T, T//S) + 1`` — e.g. S=20, T=1000 gives
    ``[1, 51, 101, ..., 951]``.
    """
    if method != "uniform":
        raise NotImplementedError(f"ddim discretization {method!r}")
    c = num_train_timesteps // num_ddim_steps
    steps = np.arange(0, num_ddim_steps) * c + 1
    return steps.astype(np.int32)
