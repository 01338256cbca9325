"""The assembled system: VAE + UNet + ControlNet + text encoders + LoRA as one param bundle.

This is the TPU-native equivalent of the reference's vendored ``LatentDiffusion``/``ControlLDM``
object (``create_model(yaml)`` + monkey-patched text encoder + in-place LoRA wrapping, e.g.
``LoRA_modified/multiseg_19prompts_batch1_shuffle_addlrSD.py:280-351``). Instead of a stateful
model object, the pipeline is a frozen config + a dict of **parameter collections**:

    {"unet", "vae", "controlnet", "bert", "adapter", "unet_lora", "ctrl_lora", ["clip"]}

kept separate because the reference's whole checkpoint story is collection-wise: base weights
loaded ``strict=False``, then filtered LoRA/adapter checkpoints overlaid
(``quantitative_metrics.py:44-55``), and each training config marks different collections (or
sub-paths of them) trainable. ``apply_model`` mirrors the reference's
``model.apply_model(z_noisy, t, {c_crossattn, c_concat})`` contract (``addlrSD.py:458``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from topomap_tpu.core import DDIMConfig, DiffusionSchedule, ddim_sample, make_schedule
from topomap_tpu.lora import LoRASpec, build_lora_tree
from topomap_tpu.models.adapters import AdapterConfig, adapter_apply, adapter_init
from topomap_tpu.models.attention import AttnFn, xla_attention
from topomap_tpu.models.controlnet import controlnet_apply, controlnet_init
from topomap_tpu.models.text_encoders import (
    TextEncoderConfig,
    text_encoder_apply,
    text_encoder_init,
)
from topomap_tpu.models.unet import UNetConfig, unet_apply, unet_init
from topomap_tpu.models.vae import VAEConfig, vae_decode, vae_encode, vae_init, vae_sample_latent
from topomap_tpu.text.tokenizer import MAXLEN, CLIPTokenizer, WordPieceTokenizer

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    unet: UNetConfig = UNetConfig()
    vae: VAEConfig = VAEConfig()
    bert: TextEncoderConfig = TextEncoderConfig.bert_base()
    clip: Optional[TextEncoderConfig] = TextEncoderConfig.clip_l()
    adapter: AdapterConfig = AdapterConfig.config3()
    unet_lora: Optional[LoRASpec] = None     # config 3: LoRASpec.qkv(8, 8)
    ctrl_lora: Optional[LoRASpec] = LoRASpec.ctrlora(32)
    num_train_timesteps: int = 1000
    compute_dtype: Any = jnp.bfloat16
    # Text-conditioning pathway (SURVEY.md §2.3): "adapter" = frozen BERT + LastStateAdapter
    # (all main configs); "pooler" = CLS pooler-MLP added to every token; "bert_last_layer" =
    # raw BERT hidden states with the last layer FFN trainable; "embfussion" = gated
    # CLIP⊕BERT residual fusion (requires clip).
    text_mode: str = "adapter"

    @staticmethod
    def sd15_config3() -> "PipelineConfig":
        """Flagship config 3 (addlrSD): ctrlora rank-32 + UNet qkv LoRA r=8."""
        return PipelineConfig(unet_lora=LoRASpec.qkv(8, 8), ctrl_lora=LoRASpec.ctrlora(32))

    @staticmethod
    def sd15_config2() -> "PipelineConfig":
        return PipelineConfig(unet_lora=None, ctrl_lora=LoRASpec.ctrlora(12))

    @staticmethod
    def sd15_config1() -> "PipelineConfig":
        return PipelineConfig(unet_lora=None, ctrl_lora=LoRASpec.ctrlora(12))

    @staticmethod
    def tiny(with_clip: bool = False) -> "PipelineConfig":
        """Test-scale pipeline: ~10⁵ params, latent 8×8 for 32² tiles."""
        return PipelineConfig(
            unet=UNetConfig.tiny(context_dim=32),
            vae=VAEConfig.tiny(),
            bert=TextEncoderConfig.tiny(),
            clip=TextEncoderConfig.tiny(causal=True) if with_clip else None,
            adapter=AdapterConfig(dim=32, hidden=32, depth=2),
            unet_lora=LoRASpec.qkv(2, 4),
            ctrl_lora=LoRASpec.ctrlora(4),
            compute_dtype=jnp.float32,
        )


def init_pipeline(key, cfg: PipelineConfig) -> Params:
    keys = jax.random.split(key, 8)
    params: Params = {
        "unet": unet_init(keys[0], cfg.unet),
        "vae": vae_init(keys[1], cfg.vae),
        "controlnet": controlnet_init(keys[2], cfg.unet, hint_downscale=cfg.vae.downscale),
        "bert": text_encoder_init(keys[3], cfg.bert),
        "adapter": adapter_init(keys[4], cfg.adapter),
    }
    if cfg.clip is not None:
        params["clip"] = text_encoder_init(keys[5], cfg.clip)
    if cfg.text_mode == "pooler":
        from topomap_tpu.models.adapters import pooler_mlp_init

        params["pooler"] = pooler_mlp_init(jax.random.fold_in(key, 100), cfg.bert.hidden)
    if cfg.text_mode == "embfussion":
        from topomap_tpu.text.fusion import embfussion_init

        params["fusion"] = embfussion_init(cfg.bert.hidden)
    if cfg.unet_lora is not None:
        params["unet_lora"] = build_lora_tree(params["unet"], cfg.unet_lora, keys[6])
    if cfg.ctrl_lora is not None:
        params["ctrl_lora"] = build_lora_tree(params["controlnet"], cfg.ctrl_lora, keys[7])
    return params


def merge_for_sampling(params: Params) -> Params:
    """Fold LoRA trees into their base weights for inference (``lora.merge_lora``): the
    sampling path then runs with zero per-layer adapter cost — measured 2.7× per-step win
    on v5e vs runtime adapters. Conditional (CN-LoRA) trees are kept runtime."""
    from topomap_tpu.lora import merge_lora

    out = dict(params)
    for base, tree in (("unet", "unet_lora"), ("controlnet", "ctrl_lora")):
        if tree in out and out[tree]:
            try:
                out[base] = merge_lora(out[base], out[tree])
                out.pop(tree)
            except ValueError:
                pass  # conditional leaves cannot merge — leave the tree in place
    return out


def simulate_pretrained(params: Params, key, scale: float = 0.02) -> Params:
    """Replace all-zero leaves of the BASE collections (unet/vae/controlnet/bert/clip/adapter)
    with small random values, leaving LoRA trees untouched (B stays 0 → identity).

    Rationale: every reference config assumes the pretrained ``Swisstopo.ckpt`` base, whose
    zero_module-initialized layers are no longer zero after SD training. A from-scratch
    zero-init base has a dead output conv, so LoRA-only training configs would receive zero
    gradient. Tests and from-scratch experiments call this to get a "trained-base-like"
    starting point; production loads real converted checkpoints instead
    (``topomap_tpu.utils.torch_ckpt``).
    """
    import numpy as np

    from topomap_tpu.models.nn import np_rng

    out = dict(params)
    for ci, coll in enumerate(("unet", "vae", "controlnet", "bert", "clip", "adapter")):
        if coll not in out:
            continue
        leaves, treedef = jax.tree.flatten(out[coll])
        rng = np_rng(jax.random.fold_in(key, ci))
        new = []
        for l in leaves:
            arr = np.asarray(l)
            # prefix check is a fast reject: np.any doesn't short-circuit on floats,
            # so scan 256 elements before committing to the full (multi-MB) array
            if not arr.ravel()[:256].any() and not arr.any():  # zero-init leaf
                l = jnp.asarray(rng.standard_normal(arr.shape, dtype=np.float32) * scale, l.dtype)
            new.append(l)
        out[coll] = jax.tree.unflatten(treedef, new)
    return out


def make_tokenizers(cfg: PipelineConfig, vocab_file=None, clip_vocab=None, clip_merges=None):
    wp = WordPieceTokenizer(vocab_file, vocab_size=cfg.bert.vocab_size)
    ct = (
        CLIPTokenizer(clip_vocab, clip_merges, vocab_size=cfg.clip.vocab_size)
        if cfg.clip is not None
        else None
    )
    return wp, ct


def encode_text(
    params: Params, cfg: PipelineConfig, ids: jnp.ndarray, attn_mask: jnp.ndarray
) -> jnp.ndarray:
    """Text conditioning per ``cfg.text_mode``.

    * "adapter" (default, ``addlrSD.py:186-198``): frozen BERT last_hidden_state
      (stop_gradient) → trainable LastStateAdapter → [B,77,768].
    * "pooler" (``Training_sdfusion_bert_pooler.py:136-189``): frozen BERT → CLS pooler-MLP
      added onto every token.
    * "bert_last_layer" (``Training_sdfusion_bert.py:118-133``): raw BERT hidden states with
      gradients flowing (the optimizer mask freezes everything but the last layer's FFN).
    * "embfussion": BERT side of the gated fusion — raw hidden states; the fusion itself
      happens in ``topomap_tpu.text.fusion.fuse_embfussion`` with ``params["fusion"]``.
    """
    hidden = text_encoder_apply(params["bert"], cfg.bert, ids, attn_mask)
    if cfg.text_mode == "adapter":
        return adapter_apply(params["adapter"], cfg.adapter, jax.lax.stop_gradient(hidden))
    if cfg.text_mode == "pooler":
        from topomap_tpu.models.adapters import pooler_mlp_apply

        return pooler_mlp_apply(params["pooler"], jax.lax.stop_gradient(hidden))
    return hidden  # bert_last_layer / embfussion: trainability handled by optimizer mask


def encode_clip(params: Params, cfg: PipelineConfig, ids: jnp.ndarray) -> jnp.ndarray:
    """``get_learned_conditioning`` — frozen CLIP text tower."""
    return jax.lax.stop_gradient(text_encoder_apply(params["clip"], cfg.clip, ids))


def apply_model(
    params: Params,
    cfg: PipelineConfig,
    z_noisy: jnp.ndarray,
    t: jnp.ndarray,
    cond: dict[str, jnp.ndarray],
    control_scales: Optional[jnp.ndarray] = None,
    attn_fn: AttnFn = xla_attention,
    remat: bool = False,
    zero_ctx_tail: int = 0,
) -> jnp.ndarray:
    """eps prediction with ControlNet conditioning.

    ``cond = {"crossattn": [B,T,D], "concat": [B,H,W,3]}`` — the jnp equivalent of the
    reference's ``{c_crossattn: [...], c_concat: [...]}``. An optional
    ``cond["hint_features"]`` carries the precomputed (scan-hoisted) hint-block output.
    ``zero_ctx_tail``: static count of trailing batch items whose crossattn context is all
    zeros (the CFG uncond half) — their cross-attentions collapse to the to_out bias,
    bit-exactly (see ``models.attention.transformer_block``).
    """
    control = controlnet_apply(
        params["controlnet"],
        cfg.unet,
        z_noisy,
        cond["concat"],
        t,
        cond["crossattn"],
        lora=params.get("ctrl_lora"),
        attn_fn=attn_fn,
        control_scales=control_scales,
        compute_dtype=cfg.compute_dtype,
        hint_downscale=cfg.vae.downscale,
        remat=remat,
        guided_hint=cond.get("hint_features"),
        zero_ctx_tail=zero_ctx_tail,
    )
    return unet_apply(
        params["unet"],
        cfg.unet,
        z_noisy,
        t,
        cond["crossattn"],
        control=control,
        lora=params.get("unet_lora"),
        attn_fn=attn_fn,
        compute_dtype=cfg.compute_dtype,
        remat=remat,
        zero_ctx_tail=zero_ctx_tail,
    )


def deep_cache_shape(cfg: PipelineConfig, batch: int, latent_hw: tuple[int, int]):
    """Shape of the deep-cache carry: the hidden state entering the level-0 decoder blocks
    (just after the level-1 'up' conv) — [B, h, w, model_channels·channel_mult[1]]."""
    u = cfg.unet
    assert len(u.channel_mult) >= 2, "deep cache needs at least one downsample level"
    c = u.model_channels * u.channel_mult[1]
    return (batch, latent_hw[0], latent_hw[1], c)


def apply_model_cached(
    params: Params,
    cfg: PipelineConfig,
    z_noisy: jnp.ndarray,
    t: jnp.ndarray,
    cond: dict[str, jnp.ndarray],
    cache: Params,
    refresh,
    control_scales: Optional[jnp.ndarray] = None,
    attn_fn: AttnFn = xla_attention,
    zero_ctx_tail: int = 0,
) -> tuple[jnp.ndarray, Params]:
    """DeepCache-style eps prediction (arXiv:2312.00858, opt-in; see
    ``DDIMConfig.deep_cache_interval``): on ``refresh`` steps the FULL UNet+ControlNet run
    and the deep trunk output (everything below the full-latent-resolution level, of both
    networks) is stored in ``cache``; on reuse steps only the level-0 encoder/decoder
    blocks of the UNet and the level-0 ControlNet branch recompute (the parts that consume
    the fresh ``x_t``), re-using the cached trunk. Exactness: ``refresh=True`` every step
    reproduces :func:`apply_model` bit-for-bit.
    """
    from topomap_tpu.models.controlnet import hint_block_apply
    from topomap_tpu.models.nn import conv
    from topomap_tpu.models.unet import (
        shallow_split,
        unet_decoder_apply,
        unet_encoder_apply,
        unet_middle_apply,
        unet_time_embed,
    )
    from topomap_tpu.ops.fused_norm import group_norm_silu

    ucfg = cfg.unet
    cd = cfg.compute_dtype
    n_enc_sh, n_dec_sh = shallow_split(ucfg)
    up, cp = params["unet"], params["controlnet"]
    ul = params.get("unet_lora") or {}
    cl = params.get("ctrl_lora") or {}
    z = z_noisy.astype(cd)
    ctx = cond["crossattn"].astype(cd)
    hint = cond["concat"].astype(cd)

    u_emb = unet_time_embed(up, ucfg, t, cd)
    c_emb = unet_time_embed(cp, ucfg, t, cd)

    def scale(i, o):
        return o if control_scales is None else o * control_scales[i].astype(o.dtype)

    # --- every step: level-0 branches of both networks ---
    if "hint_features" in cond:
        guided = cond["hint_features"].astype(cd)
    else:
        guided = hint_block_apply(cp["input_hint_block"], hint, cfg.vae.downscale)
    c_hs_sh = unet_encoder_apply(
        cp["encoder"], ucfg, z, c_emb, ctx, cl.get("encoder"), attn_fn,
        extra_first=guided, stop=n_enc_sh, zero_ctx_tail=zero_ctx_tail,
    )
    ctrl_sh = [scale(i, conv(cp["zero_convs"][i], s)) for i, s in enumerate(c_hs_sh)]
    u_hs_sh = unet_encoder_apply(
        up["encoder"], ucfg, z, u_emb, ctx, ul.get("encoder"), attn_fn, stop=n_enc_sh,
        zero_ctx_tail=zero_ctx_tail,
    )

    n_dec_total = len(up["decoder"]["blocks"])

    def deep(_):
        c_hs_dp = unet_encoder_apply(
            cp["encoder"], ucfg, c_hs_sh[-1], c_emb, ctx, cl.get("encoder"), attn_fn,
            start=n_enc_sh, zero_ctx_tail=zero_ctx_tail,
        )
        c_mid = unet_middle_apply(
            cp["middle"], ucfg, c_hs_dp[-1], c_emb, ctx, cl.get("middle"), attn_fn,
            zero_ctx_tail=zero_ctx_tail,
        )
        ctrl_dp = [
            scale(n_enc_sh + i, conv(cp["zero_convs"][n_enc_sh + i], s))
            for i, s in enumerate(c_hs_dp)
        ]
        ctrl_mid = scale(n_enc_sh + len(c_hs_dp), conv(cp["middle_block_out"], c_mid))

        u_hs_dp = unet_encoder_apply(
            up["encoder"], ucfg, u_hs_sh[-1], u_emb, ctx, ul.get("encoder"), attn_fn,
            start=n_enc_sh, zero_ctx_tail=zero_ctx_tail,
        )
        u_mid = unet_middle_apply(
            up["middle"], ucfg, u_hs_dp[-1], u_emb, ctx, ul.get("middle"), attn_fn,
            zero_ctx_tail=zero_ctx_tail,
        )
        u_mid = u_mid + ctrl_mid.astype(u_mid.dtype)
        u_hs_dp = [s + c.astype(s.dtype) for s, c in zip(u_hs_dp, ctrl_dp)]
        h_deep = unet_decoder_apply(
            up["decoder"], ucfg, u_mid, u_hs_dp, u_emb, ctx, ul.get("decoder"), attn_fn,
            stop=n_dec_total - n_dec_sh, zero_ctx_tail=zero_ctx_tail,
        )
        return {"h_deep": h_deep.astype(cd)}

    cache = jax.lax.cond(refresh, deep, lambda _: cache, None)

    u_hs_sh2 = [s + c.astype(s.dtype) for s, c in zip(u_hs_sh, ctrl_sh)]
    h = unet_decoder_apply(
        up["decoder"], ucfg, cache["h_deep"], u_hs_sh2, u_emb, ctx, ul.get("decoder"),
        attn_fn, start=n_dec_total - n_dec_sh, zero_ctx_tail=zero_ctx_tail,
    )
    h = group_norm_silu(up["out_norm"], h)
    eps = conv(up["out_conv"], h).astype(jnp.float32)
    return eps, cache


def hint_features(params: Params, cfg: PipelineConfig, seg: jnp.ndarray) -> jnp.ndarray:
    """Precompute the ControlNet hint-block output for a seg tile (``[B,h,w,model_ch]``).
    Samplers pass this as ``cond["hint_features"]`` so the image-resolution hint convs run
    ONCE per tile instead of once per scan step."""
    from topomap_tpu.models.controlnet import hint_block_apply

    return hint_block_apply(
        params["controlnet"]["input_hint_block"],
        seg.astype(cfg.compute_dtype),
        cfg.vae.downscale,
    )


def encode_image(params: Params, cfg: PipelineConfig, rng, img: jnp.ndarray) -> jnp.ndarray:
    """``get_first_stage_encoding(encode_first_stage(img))`` — [B,H,W,3] in [−1,1] → scaled latent."""
    mean, logvar = vae_encode(params["vae"], cfg.vae, img)
    return vae_sample_latent(rng, mean, logvar, cfg.vae.scale_factor)


def decode_latent(
    params: Params, cfg: PipelineConfig, z: jnp.ndarray, compute_dtype=jnp.float32
) -> jnp.ndarray:
    """``decode_first_stage`` with clamp (``vis_metrics.py:450-452``); fp32 by default."""
    return jnp.clip(vae_decode(params["vae"], cfg.vae, z, compute_dtype), -1.0, 1.0)


def sample(
    params: Params,
    cfg: PipelineConfig,
    sched: DiffusionSchedule,
    ddim: DDIMConfig,
    rng,
    seg: jnp.ndarray,
    crossattn: jnp.ndarray,
    uncond_crossattn: Optional[jnp.ndarray] = None,
    control_scales: Optional[jnp.ndarray] = None,
    attn_fn: AttnFn = xla_attention,
    decode: bool = True,
    decode_dtype=jnp.float32,
    z_init: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full conditional DDIM sampling of a batch of tiles.

    Reference semantics (``vis_metrics.sample_preview:408-452``): uncond cross-attention is a
    ZERO embedding by default; both branches share the seg hint. Returns decoded images in
    [−1,1] (or raw latents with ``decode=False``). ``z_init`` overrides the initial x_T
    latent (per-request deterministic noise under server-side micro-batching).
    """
    b = seg.shape[0]
    ds = cfg.vae.downscale
    shape = (b, seg.shape[1] // ds, seg.shape[2] // ds, cfg.unet.in_channels)
    zero_uncond = uncond_crossattn is None
    if uncond_crossattn is None:
        uncond_crossattn = jnp.zeros_like(crossattn)
    # hint block hoisted out of the DDIM scan: seg-only dependence, identical math
    gh = hint_features(params, cfg, seg)
    cond = {"crossattn": crossattn, "concat": seg, "hint_features": gh}
    uncond = {"crossattn": uncond_crossattn, "concat": seg, "hint_features": gh}

    # CFG zero-context shortcut: the reference's uncond embedding is a ZERO tensor, so
    # cross-attention is skipped — bit-exactly (see apply_model / models.attention.
    # transformer_block) — for (a) the trailing B items of the 2B parallel-CFG forwards
    # ([cond; uncond] concat in core.ddim/dpm_solver; batch size is static at trace
    # time) and (b) whole uncond-only calls (lazy/sequential CFG pass the ``uncond``
    # dict by identity).
    def tail(z, c):
        if not zero_uncond:
            return 0
        if c["crossattn"].shape[0] == 2 * b:
            return b  # 2B parallel-CFG batch, or batch-B shared-prefix fork (cfg_fork)
        return z.shape[0] if c is uncond else 0

    denoise = lambda z, t, c: apply_model(
        params, cfg, z, t, c, control_scales=control_scales, attn_fn=attn_fn,
        zero_ctx_tail=tail(z, c),
    )
    # CFG shared-prefix fork (DDIMConfig.cfg_fork, exact): latents/t/hint stay at batch B;
    # only the crossattn context is the 2B [cond; uncond] concat — apply_model duplicates
    # the hidden states at the first cross-attention, where the halves first diverge.
    cond_fork2 = None
    if ddim.cfg_fork and ddim.parallel_cfg and ddim.guidance_scale != 1.0 \
            and ddim.cfg_interval == 1:
        cond_fork2 = {
            "crossattn": jnp.concatenate([crossattn, uncond_crossattn], axis=0),
            "concat": seg,
            "hint_features": gh,
        }
    denoise_cached = cache0 = None
    if ddim.deep_cache_interval > 1:
        denoise_cached = lambda z, t, c, cache, refresh: apply_model_cached(
            params, cfg, z, t, c, cache, refresh,
            control_scales=control_scales, attn_fn=attn_fn, zero_ctx_tail=tail(z, c),
        )
        cb = b if ddim.guidance_scale == 1.0 else 2 * b
        cache0 = {
            "h_deep": jnp.zeros(
                deep_cache_shape(cfg, cb, (shape[1], shape[2])), cfg.compute_dtype
            )
        }
    if ddim.solver == "dpm":
        from topomap_tpu.core.dpm_solver import dpm_solver_sample

        assert ddim.cfg_interval == 1, "solver='dpm' excludes cfg_interval (lazy CFG)"
        z0 = dpm_solver_sample(denoise, sched, ddim.num_steps, ddim.guidance_scale, rng,
                               shape, cond, uncond, x_T=z_init, unroll=ddim.unroll,
                               denoise_cached=denoise_cached, cache0=cache0,
                               deep_cache_interval=ddim.deep_cache_interval,
                               cond_fork2=cond_fork2)
        return decode_latent(params, cfg, z0, decode_dtype) if decode else z0
    z0 = ddim_sample(denoise, sched, ddim, rng, shape, cond, uncond,
                     denoise_cached=denoise_cached, cache0=cache0, x_T=z_init,
                     cond_fork2=cond_fork2)
    return decode_latent(params, cfg, z0, decode_dtype) if decode else z0


def sample_consistency(
    params: Params,
    cfg: PipelineConfig,
    sched: DiffusionSchedule,
    num_steps: int,
    rng,
    seg: jnp.ndarray,
    crossattn: jnp.ndarray,
    control_scales: Optional[jnp.ndarray] = None,
    attn_fn: AttnFn = xla_attention,
    decode: bool = True,
    decode_dtype=jnp.float32,
    sigma_data: float = 0.5,
    timestep_scaling: float = 10.0,
    z_init: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Few-step sampling with a consistency-distilled student (``train.distill``,
    mode="consistency"): ``num_steps`` SINGLE model evaluations — no CFG pair, guidance is
    baked into the student adapters. 1–8 steps vs the reference's 2×12–50 evaluations."""
    from topomap_tpu.core.consistency import consistency_sample

    b = seg.shape[0]
    ds = cfg.vae.downscale
    shape = (b, seg.shape[1] // ds, seg.shape[2] // ds, cfg.unet.in_channels)
    denoise = lambda z, t, c: apply_model(
        params, cfg, z, t, c, control_scales=control_scales, attn_fn=attn_fn
    )
    cond = {"crossattn": crossattn, "concat": seg,
            "hint_features": hint_features(params, cfg, seg)}
    z0 = consistency_sample(
        denoise, sched, num_steps, rng, shape, cond,
        sigma_data=sigma_data, timestep_scaling=timestep_scaling, x_T=z_init,
    )
    return decode_latent(params, cfg, z0, decode_dtype) if decode else z0
