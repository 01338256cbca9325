"""First-stage VAE pretraining — the capability the reference gets for free from
``Swisstopo.ckpt``'s bundled SD autoencoder.

Every reference config assumes a *pretrained* first stage (``addlrSD.py:437-438`` calls
``encode_first_stage`` on a frozen, already-trained VAE). This repo's self-contained runs
start from ``simulate_pretrained`` random weights, for which ``decode(encode(x)) != x`` —
so image-level prompt adherence is unprovable without first training the autoencoder.
This module trains ``params["vae"]`` alone on map tiles with the LDM AutoencoderKL loss
shape (reconstruction + tiny KL, ``kl_weight=1e-6`` as in latent-diffusion's
autoencoder configs), plus one TPU-build-specific term: a latent-scale penalty pulling
``std(mean) * scale_factor`` toward 1 so that downstream ``q_sample`` sees unit-variance
latents without re-deriving SD's 0.18215 magic constant for a fresh autoencoder.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from topomap_tpu.models.vae import VAEConfig, vae_decode, vae_encode
from topomap_tpu.models.nn import Params


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VAETrainState:
    params: Params  # the vae tree only
    opt_state: object
    step: jnp.ndarray


def kl_divergence(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Diagonal-Gaussian KL to N(0, I), mean over batch, summed over latent dims
    (LDM ``DiagonalGaussianDistribution.kl``)."""
    per = 0.5 * jnp.sum(mean**2 + jnp.exp(logvar) - 1.0 - logvar, axis=(1, 2, 3))
    return jnp.mean(per)


def make_vae_train_step(cfg: VAEConfig, tx, kl_weight: float = 1e-6,
                        l1_weight: float = 0.2, scale_weight: float = 0.05):
    """Jittable (state, gt[B,H,W,3] in [-1,1], rng) -> (state, metrics) step."""

    def step(state: VAETrainState, gt: jnp.ndarray, rng):
        def loss_fn(vae):
            mean, logvar = vae_encode(vae, cfg, gt)
            noise = jax.random.normal(jax.random.fold_in(rng, state.step), mean.shape)
            z = mean + jnp.exp(0.5 * logvar) * noise
            recon = vae_decode(vae, cfg, z * cfg.scale_factor)
            mse = jnp.mean((recon - gt) ** 2)
            l1 = jnp.mean(jnp.abs(recon - gt))
            kl = kl_divergence(mean, logvar)
            # Pull the *scaled* latent toward unit variance (see module docstring).
            scaled_std = jnp.std(mean) * cfg.scale_factor
            scale_pen = jnp.log(scaled_std + 1e-8) ** 2
            total = mse + l1_weight * l1 + kl_weight * kl + scale_weight * scale_pen
            return total, {"mse": mse, "l1": l1, "kl": kl, "latent_std": scaled_std}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return VAETrainState(params, opt_state, state.step + 1), dict(aux, loss=loss)

    return step


def make_recon_psnr(cfg: VAEConfig):
    """Jittable deterministic (mean-latent) reconstruction PSNR on [-1,1] images."""

    def fn(vae: Params, gt: jnp.ndarray) -> jnp.ndarray:
        mean, _ = vae_encode(vae, cfg, gt)
        recon = vae_decode(vae, cfg, mean * cfg.scale_factor)
        mse = jnp.mean(((recon - gt) * 0.5) ** 2)  # rescale to [0,1] range for PSNR
        return -10.0 * jnp.log10(mse + 1e-12)

    return fn


def build_vae_optimizer(lr: float = 1e-4, total_steps: int = 3000, warmup: int = 100,
                        lr_floor: float = 1e-5):
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, total_steps, lr_floor)
    return optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched, weight_decay=0.0))


def random_crops(gt: np.ndarray, crop: int, rng: np.random.Generator) -> np.ndarray:
    """Host-side random spatial crops [B,H,W,3] -> [B,crop,crop,3] (VAE is fully
    convolutional; training on crops quarters the step cost at 256 vs 512)."""
    b, h, w, _ = gt.shape
    if crop >= h and crop >= w:
        return gt
    ys = rng.integers(0, h - crop + 1, b)
    xs = rng.integers(0, w - crop + 1, b)
    return np.stack([gt[i, ys[i]:ys[i] + crop, xs[i]:xs[i] + crop] for i in range(b)])
