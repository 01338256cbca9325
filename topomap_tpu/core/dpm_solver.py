"""DPM-Solver++(2M): second-order multistep diffusion ODE solver, data-prediction form.

Beyond-reference capability (arXiv:2211.01095): the reference samples exclusively with
first-order DDIM (vendored ``cldm/ddim_hacked.DDIMSampler``, e.g. ``BaseModel/evaluateCN.py:93``
at 20 steps, ``LoRA_modified/quantitative_metrics.py:216`` at 12). A second-order solver
reaches 50-step-DDIM quality at ~15–20 model evaluations with EXACT model math — no
distillation, caching, or approximation — so it multiplies with every other speed lever.

TPU shape: all per-step coefficients are tiny numpy-precomputed tables gathered inside one
``lax.scan``; the first-order bootstrap step is folded in as a zeroed second-order
coefficient row (no ``lax.cond`` branch, fully static). Classifier-free guidance runs as the
same 2B-batched cond+uncond forward as :func:`topomap_tpu.core.ddim.ddim_sample`.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.core.schedules import DiffusionSchedule, make_ddim_timesteps

DenoiseFn = Any


def _dpm_tables(sched: DiffusionSchedule, num_steps: int):
    """Per-update constants for the descending point ladder t_0 > t_1 > … > t_S(≈0).

    Points 0..S−1 are the DDIM ladder timesteps (descending); point S is the final
    alpha-bar[0] anchor (the same terminal point DDIM's ``alphas_prev[0]`` uses). With
    λ_i = log(α_i/σ_i) and h_i = λ_{i+1} − λ_i (positive: λ grows as t falls), the 2M
    update from point i to i+1 is

        x_{i+1} = (σ_{i+1}/σ_i)·x_i + c0_i·m_i + c1_i·(m_i − m_{i−1}),

    where m_i = x0-prediction at point i, c0 = −α_{i+1}(e^{−h_i} − 1) and
    c1 = c0·h_i/(2·h_{i−1}) (zero for the bootstrap row i=0 → exact first-order step).
    """
    ts = make_ddim_timesteps(num_steps, sched.num_timesteps)
    ab = np.asarray(sched.alphas_cumprod, np.float64)
    ab_pts = np.concatenate([ab[ts[::-1]], [ab[0]]])  # descending t; final anchor at ab[0]
    alpha = np.sqrt(ab_pts)
    sigma = np.sqrt(1.0 - ab_pts)
    lam = np.log(alpha / sigma)
    h = lam[1:] - lam[:-1]  # [S], gap of update i (point i -> i+1)
    c_x = sigma[1:] / sigma[:-1]
    c0 = -alpha[1:] * np.expm1(-h)
    c1 = np.zeros_like(c0)
    c1[1:] = c0[1:] * h[1:] / (2.0 * h[:-1])
    t_pts = np.concatenate([np.asarray(ts[::-1]), [0]])
    return (
        jnp.asarray(t_pts[:-1], jnp.int32),  # model-eval timestep at point i
        jnp.asarray(alpha[:-1], jnp.float32),
        jnp.asarray(sigma[:-1], jnp.float32),
        jnp.asarray(c_x, jnp.float32),
        jnp.asarray(c0, jnp.float32),
        jnp.asarray(c1, jnp.float32),
    )


def dpm_solver_sample(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    num_steps: int,
    guidance_scale: float,
    rng: jax.Array,
    shape: tuple[int, ...],
    cond: Any,
    uncond: Any,
    x_T: jnp.ndarray | None = None,
    unroll: int = 1,
    denoise_cached=None,
    cache0: Any = None,
    deep_cache_interval: int = 1,
    cond_fork2: Any = None,
) -> jnp.ndarray:
    """Sample latents with DPM-Solver++(2M): ``num_steps`` model evaluations (each a
    2B-batched cond+uncond forward under guidance), one jitted ``lax.scan``.

    Deterministic (ODE) — there is no eta. Returns the final latent at the alpha-bar[0]
    anchor, decode with the VAE afterwards.

    ``deep_cache_interval > 1`` composes DeepCache with the solver (same
    ``denoise_cached(x, t, cond, cache, refresh) -> (eps, cache)`` contract as
    :func:`topomap_tpu.core.ddim.ddim_sample`); ``refresh`` every step reproduces the
    exact solver bit-for-bit.
    """
    t_pts, alphas, sigmas, c_x, c0, c1 = _dpm_tables(sched, num_steps)
    b = shape[0]

    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape, jnp.float32) if x_T is None else x_T

    use_cache = deep_cache_interval > 1
    if use_cache:
        assert denoise_cached is not None and cache0 is not None, (
            "deep_cache_interval > 1 needs denoise_cached/cache0 (see pipeline.sample)"
        )
    if guidance_scale != 1.0:
        cond2 = jax.tree.map(lambda c, u: jnp.concatenate([c, u], axis=0), cond, uncond)

    def model_x0(x_t, i, cache):
        t_b = jnp.full((b,), t_pts[i], jnp.int32)
        refresh = (i % deep_cache_interval) == 0
        if guidance_scale == 1.0:
            if use_cache:
                eps, cache = denoise_cached(x_t, t_b, cond, cache, refresh)
            else:
                eps = denoise_fn(x_t, t_b, cond)
        else:
            if cond_fork2 is not None:
                # CFG shared-prefix fork: batch-B latents, 2B contexts (core.ddim.DDIMConfig)
                x2, t2, c2 = x_t, t_b, cond_fork2
            else:
                x2 = jnp.concatenate([x_t, x_t], axis=0)
                t2 = jnp.concatenate([t_b, t_b], axis=0)
                c2 = cond2
            if use_cache:
                eps2, cache = denoise_cached(x2, t2, c2, cache, refresh)
            else:
                eps2 = denoise_fn(x2, t2, c2)
            eps = eps2[b:] + guidance_scale * (eps2[:b] - eps2[b:])
        return (x_t - sigmas[i] * eps) / alphas[i], cache

    def step(carry, i):
        x_i, m_prev, cache = carry
        m, cache = model_x0(x_i, i, cache)
        # bootstrap row i=0 has c1[0]=0, so the (m − m_prev) term vanishes exactly and the
        # update is the first-order (DDIM-in-x0-form) step — no branch needed.
        x_next = c_x[i] * x_i + c0[i] * m + c1[i] * (m - m_prev)
        return (x_next, m, cache), None

    (x, _, _), _ = jax.lax.scan(
        step, (x, jnp.zeros(shape, jnp.float32), cache0), jnp.arange(num_steps),
        unroll=unroll,
    )
    return x
