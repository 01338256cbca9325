"""The jitted training step and loop.

TPU-native redesign of the reference's per-script training loop
(``multiseg_19prompts_batch1_shuffle_addlrSD.py:429-488``): VAE-encode → ``q_sample`` →
``apply_model`` → ε-MSE → clip → AdamW. Differences that matter on TPU:

* The entire step — including the frozen-BERT text encoding and VAE encode — is ONE jitted
  function; nothing crosses the host boundary but the input batch and the scalar loss.
* Frozen parameters are excluded from differentiation with ``stop_gradient`` (via the
  trainable mask), not by Python-level ``requires_grad`` mutation.
* AMP GradScaler is unnecessary: matmuls run in bfloat16 (no gradient underflow scaling
  needed on TPU), fp32 master weights and fp32 loss.
* Data parallelism is a sharding annotation (batch axis over the mesh); the gradient
  all-reduce is inserted by GSPMD. The reference trained at batch 1 *because of memory*;
  here global batch = per-chip batch × mesh size.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from topomap_tpu.core import DiffusionSchedule, q_sample
from topomap_tpu.core.schedules import predict_start_from_noise
from topomap_tpu.pipeline import PipelineConfig, apply_model, encode_text, decode_latent
from topomap_tpu.models.vae import vae_encode, vae_sample_latent
from topomap_tpu.train.losses import eps_mse, masked_color_losses, maskloss_total
from topomap_tpu.train.optim import OptimConfig, LABELERS, ParamPartition, build_optimizer, trainable_mask  # noqa: F401 (re-exported)

Params = dict[str, Any]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def drop_context(rng, c: jnp.ndarray, p: float) -> jnp.ndarray:
    """Row-wise CFG prompt dropout: each batch element's [T,D] context is replaced by
    zeros (the uncond embedding) with probability ``p``. ``p == 0`` is the identity and
    adds nothing to the graph."""
    if p <= 0.0:
        return c
    drop = jax.random.bernoulli(rng, p, (c.shape[0],))
    return jnp.where(drop[:, None, None], jnp.zeros_like(c), c)


def make_train_step(
    cfg: PipelineConfig,
    sched: DiffusionSchedule,
    tx: optax.GradientTransformation,
    partition: ParamPartition,
    labeler_name: str = "config3",
    use_maskloss: bool = False,
    maskloss_warmup: int = 10_000,
    attn_fn=None,
    use_lpips: bool = False,
    lpips_params=None,
    lpips_weights: tuple[float, float] = (0.3, 0.7),
    remat: bool = False,
    cfg_dropout: float = 0.0,
) -> Callable:
    """Build the jitted train step.

    Batch schema (device arrays): ``{"seg": [B,H,W,3] f32 [0,1], "gt": [B,H,W,3] f32 [−1,1],
    "ids": [B,77] i32, "mask": [B,77] i32, ["class_rgb": [B,3] f32]}``.

    ``use_lpips`` switches the loss to ``0.3·mse + 0.7·LPIPS(decode(x0), gt)`` — the
    perceptual-loss regime of ``expand_steps_and_trainingdata.py:515-523``.
    """
    from topomap_tpu.train.losses import lpips_distance, perceptual_mix_loss

    from topomap_tpu.ops.flash_attention import best_attention_fn
    attn_fn = attn_fn or best_attention_fn()

    def train_step(state: TrainState, batch, rng):
        rng_vae, rng_t, rng_noise, rng_drop = jax.random.split(
            jax.random.fold_in(rng, state.step), 4)

        def loss_fn(train_leaves):
            # Only the trainable partition is differentiated/updated — grads, optimizer
            # state and updates scale with the adapter/LoRA size, not the 1.2B trunk
            # (full-tree grads measured 20 s/step from HBM oversubscription).
            params = partition.combine(state.params, train_leaves)
            # VAE encode (frozen; sampled posterior like get_first_stage_encoding)
            mean, logvar = vae_encode(params["vae"], cfg.vae, batch["gt"])
            z = vae_sample_latent(rng_vae, mean, logvar, cfg.vae.scale_factor)
            z = jax.lax.stop_gradient(z)
            b = z.shape[0]
            t = jax.random.randint(rng_t, (b,), 0, sched.num_timesteps)
            noise = jax.random.normal(rng_noise, z.shape)
            z_noisy = q_sample(sched, z, t, noise)
            c = encode_text(params, cfg, batch["ids"], batch["mask"])
            # Classifier-free-guidance prompt dropout: with prob cfg_dropout a sample's
            # context becomes the zero tensor — the SAME uncond embedding every sampler
            # here uses for CFG (and that the zero-ctx shortcut exploits). The reference
            # inherits a trained uncond branch from pretrained SD1.5; a from-scratch
            # base must train it explicitly or guidance amplifies an arbitrary
            # never-trained direction. Also sharpens conditioning: the model must
            # separate "prompted" from "unprompted" predictions.
            c = drop_context(rng_drop, c, cfg_dropout)
            cond = {"crossattn": c, "concat": batch["seg"]}
            eps_hat = apply_model(params, cfg, z_noisy, t, cond, attn_fn=attn_fn, remat=remat)
            mse = eps_mse(eps_hat, noise)
            aux = {"train_mse": mse}
            if use_lpips:
                x0 = predict_start_from_noise(sched, z_noisy, t, eps_hat)
                img_pred = (decode_latent(params, cfg, x0) + 1.0) * 0.5
                gt01 = (batch["gt"] + 1.0) * 0.5
                lp = lpips_distance(lpips_params, img_pred, gt01)
                total = perceptual_mix_loss(mse, lp, *lpips_weights)
                aux["lpips"] = lp
                return total, aux
            if use_maskloss:
                x0 = predict_start_from_noise(sched, z_noisy, t, eps_hat)

                # bf16 decode: the in-graph 512^2 decoder is the memory hot spot of the
                # maskloss step (fp32 decode at batch 4 OOM'd 29.5G > 15.75G HBM); color
                # targets are 8-bit so bf16 resolution is ample here. The decode+loss is
                # additionally rematerialized: without jax.checkpoint the decoder's
                # activations (512^2x128 GroupNorm f32 upcasts) are held across the UNet
                # backward and the batch-2 remat scan-8 compile still OOM'd 18.85G >
                # 15.75G; checkpointing keeps them scoped to the decode's own grad
                # segment.
                @jax.checkpoint
                def color_losses(vae_params, x0):
                    img_pred = (decode_latent({"vae": vae_params}, cfg, x0,
                                              compute_dtype=jnp.bfloat16) + 1.0) * 0.5
                    gt01 = (batch["gt"] + 1.0) * 0.5
                    return masked_color_losses(img_pred, gt01, batch["seg"], batch["class_rgb"])

                lc, ls = color_losses(params["vae"], x0)
                total = maskloss_total(mse, lc, ls, state.step, maskloss_warmup)
                aux.update({"loss_color": lc, "loss_stable": ls})
                return total, aux
            return mse, aux

        train_leaves = partition.extract(state.params)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(train_leaves)
        updates, opt_state = tx.update(grads, state.opt_state, train_leaves)
        new_train = optax.apply_updates(train_leaves, updates)
        params = partition.combine(state.params, new_train)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, dict(aux, loss=loss)

    return train_step


def make_train_scan(train_step: Callable, n_steps: int) -> Callable:
    """Run ``n_steps`` train steps inside ONE jitted ``lax.scan``.

    Amortizes per-dispatch overhead (the TrainState has ~2500 leaves; on a remote-TPU
    backend a per-step dispatch measured SECONDS of host↔device orchestration against
    ~0.3 s of actual device work) and lets XLA pipeline across steps. ``batches`` is the
    step-stacked pytree: every array leaf gains a leading ``n_steps`` axis.

    Returns ``scan_fn(state, batches, rng) -> (state, stacked_metrics)``.
    """

    def scan_fn(state: TrainState, batches, rng):
        def body(carry, batch):
            new_state, metrics = train_step(carry, batch, rng)
            return new_state, metrics

        return jax.lax.scan(body, state, batches)

    return scan_fn


def stack_batches(batch_list: list) -> Any:
    """Stack a list of same-shaped batch dicts along a new leading axis for train_scan.
    String fields (prompts) are dropped — tokenize before stacking."""
    import numpy as np

    keys = [k for k in batch_list[0] if not isinstance(batch_list[0][k], (list, str))]
    return {k: np.stack([b[k] for b in batch_list]) for k in keys}


def init_train_state(
    params: Params, tx: optax.GradientTransformation, partition: ParamPartition
) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(partition.extract(params)),
        step=jnp.asarray(0, jnp.int32),
    )


def make_validate_step(cfg: PipelineConfig, sched: DiffusionSchedule, iters: int = 8, seed: int = 12345, attn_fn=None):
    """ε-MSE validation averaged over ``iters`` random (t, noise) draws with a FIXED seed —
    mirrors ``vis_metrics.validate_step`` (``:74-116``)."""

    from topomap_tpu.ops.flash_attention import best_attention_fn
    attn_fn = attn_fn or best_attention_fn()

    def validate(params: Params, batch) -> jnp.ndarray:
        rng = jax.random.PRNGKey(seed)
        mean, logvar = vae_encode(params["vae"], cfg.vae, batch["gt"])
        z = vae_sample_latent(jax.random.fold_in(rng, 0), mean, logvar, cfg.vae.scale_factor)
        c = encode_text(params, cfg, batch["ids"], batch["mask"])
        cond = {"crossattn": c, "concat": batch["seg"]}

        def body(i, acc):
            r = jax.random.fold_in(rng, i + 1)
            rt, rn = jax.random.split(r)
            t = jax.random.randint(rt, (z.shape[0],), 0, sched.num_timesteps)
            noise = jax.random.normal(rn, z.shape)
            eps_hat = apply_model(params, cfg, q_sample(sched, z, t, noise), t, cond, attn_fn=attn_fn)
            return acc + eps_mse(eps_hat, noise)

        return jax.lax.fori_loop(0, iters, body, 0.0) / iters

    return validate


class MeterEMA:
    """EMA loss meter, β=0.98 with bias correction (``vis_metrics.py:63-71``)."""

    def __init__(self, beta: float = 0.98):
        self.beta = beta
        self.value = 0.0
        self.count = 0

    def update(self, x: float) -> float:
        self.count += 1
        self.value = self.beta * self.value + (1 - self.beta) * float(x)
        return self.value / (1 - self.beta**self.count)
