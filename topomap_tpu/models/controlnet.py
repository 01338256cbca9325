"""ControlNet — the conditioning branch: UNet-encoder copy + hint block + zero convs.

Capability mirror of the vendored ``cldm.cldm.ControlNet`` (and its ctrlora LoRA variant) the
reference builds from ``cldm_v15.yaml`` / ``ctrlora_finetune_sd15_rank{12,32}.yaml``
(``LoRA_modified/multiseg_19prompts_batch1_shuffle_addlrSD.py:281-296``). The encoder +
middle-block code is literally shared with ``topomap_tpu.models.unet`` — the ControlNet is the
same functions applied to a second parameter tree, which is exactly what "trainable copy"
means and guarantees structural parity with the checkpoint converter.

Outputs 13 residuals: 12 zero-conv projections of the encoder skips + 1 ``middle_block_out``,
optionally scaled by per-residual ``control_scales`` (guess-mode schedule
``BaseModel/evaluateCN.py:91`` lives in ``topomap_tpu.core.ddim.guess_mode_control_scales``).

ctrlora semantics: the same ControlNet with a LoRA tree over its attention projections
(rank 12/32); "config 2/3" additionally train ``zero_convs``/``middle_block_out``/norm leaves —
in this framework those are *trainability masks* over this tree (``topomap_tpu.train.optim``),
not architecture changes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from topomap_tpu.models.attention import AttnFn, xla_attention
from topomap_tpu.models.nn import KeyGen, Params, conv, conv_init, dense, dense_init, silu, timestep_embedding
from topomap_tpu.models.unet import (
    UNetConfig,
    unet_encoder_apply,
    unet_encoder_init,
    unet_middle_apply,
    unet_middle_init,
)


def hint_block_init(
    kg: KeyGen, cfg: UNetConfig, hint_channels: int = 3, hint_downscale: int = 8
) -> Params:
    """ControlNet ``input_hint_block``: 8 SiLU-separated convs taking the full-res 512² hint
    down to latent resolution (8× for SD; configurable so tiny test VAEs with smaller
    downscale factors line up); channel ramp scales with model width; final conv zero-init."""
    mc = cfg.model_channels
    # Reference ramp at mc=320: 16,16,32,32,96,96,256 → 320. Scale proportionally for tiny cfgs.
    ramp = [max(mc // 20, 4)] * 2 + [max(mc // 10, 8)] * 2 + [max(3 * mc // 10, 8)] * 2 + [max(4 * mc // 5, 8)]
    chans = [hint_channels] + ramp
    convs = [conv_init(kg(), chans[i], chans[i + 1], 3) for i in range(7)]
    convs.append(conv_init(kg(), chans[-1], mc, 3, zero=True))
    return {"convs": convs}


def hint_strides(hint_downscale: int = 8) -> tuple[int, ...]:
    """Static stride plan of the hint block (strides live OUTSIDE the param pytree so they
    never become tracers under jit). Reference plan for 8×: strides 2 at convs 2/4/6."""
    n_stride2 = max(0, hint_downscale.bit_length() - 1)  # log2
    assert 2**n_stride2 == hint_downscale and n_stride2 <= 3, hint_downscale
    stride_slots = [2, 4, 6][3 - n_stride2:] if n_stride2 else []
    return tuple(2 if i in stride_slots else 1 for i in range(7)) + (1,)


def hint_block_apply(p: Params, hint: jnp.ndarray, hint_downscale: int = 8) -> jnp.ndarray:
    h = hint
    strides = hint_strides(hint_downscale)
    n = len(p["convs"])
    for i, (cp, s) in enumerate(zip(p["convs"], strides)):
        # stride-2 convs need LDM's symmetric padding=1; at stride 1, "SAME" is the
        # same thing and keeps the fast 3x3-taps path eligible
        h = conv(cp, h, stride=s, padding=1 if s > 1 else "SAME")
        if i < n - 1:
            h = silu(h)
    return h


def controlnet_init(
    key, cfg: UNetConfig = UNetConfig(), hint_channels: int = 3, hint_downscale: int = 8
) -> Params:
    kg = KeyGen(key)
    emb_dim = cfg.model_channels * 4
    enc, skips = unet_encoder_init(kg, cfg, emb_dim)
    mid_ch = cfg.model_channels * cfg.channel_mult[-1]
    return {
        "time_embed": {
            "fc1": dense_init(kg(), cfg.model_channels, emb_dim),
            "fc2": dense_init(kg(), emb_dim, emb_dim),
        },
        "input_hint_block": hint_block_init(kg, cfg, hint_channels, hint_downscale),
        "encoder": enc,
        "middle": unet_middle_init(kg, cfg, emb_dim),
        # One 1×1 zero conv per encoder skip (12 for SD1.5) + middle_block_out.
        "zero_convs": [conv_init(kg(), c, c, 1, zero=True) for c in skips],
        "middle_block_out": conv_init(kg(), mid_ch, mid_ch, 1, zero=True),
    }


def controlnet_apply(
    p: Params,
    cfg: UNetConfig,
    x: jnp.ndarray,
    hint: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    lora: Optional[Params] = None,
    attn_fn: AttnFn = xla_attention,
    control_scales: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.float32,
    hint_downscale: int = 8,
    remat: bool = False,
    guided_hint: Optional[jnp.ndarray] = None,
    zero_ctx_tail: int = 0,
) -> list[jnp.ndarray]:
    """Return the 13 control residuals for ``unet_apply(control=...)``.

    x: noisy latent [B,h,w,4]; hint: seg tile [B,8h,8w,3] in [0,1]; context [B,T,ctx].
    ``guided_hint`` (optional) is a precomputed ``hint_block_apply`` output: the hint
    block depends only on the seg tile, so samplers hoist it OUT of the DDIM scan
    (the image-resolution convs would otherwise rerun every step; XLA does not move
    them out of the scan body).
    """
    lora = lora or {}
    x = x.astype(compute_dtype)
    context = context.astype(compute_dtype)
    temb = timestep_embedding(t, cfg.model_channels)
    emb = dense(p["time_embed"]["fc2"], silu(dense(p["time_embed"]["fc1"], temb))).astype(compute_dtype)

    if guided_hint is None:
        guided = hint_block_apply(p["input_hint_block"], hint.astype(compute_dtype), hint_downscale)
    else:
        guided = guided_hint.astype(compute_dtype)
    hs = unet_encoder_apply(
        p["encoder"], cfg, x, emb, context, lora.get("encoder"), attn_fn,
        extra_first=guided, remat=remat, zero_ctx_tail=zero_ctx_tail,
    )
    h = unet_middle_apply(p["middle"], cfg, hs[-1], emb, context, lora.get("middle"), attn_fn,
                          zero_ctx_tail=zero_ctx_tail)

    outs = [conv(zc, s) for zc, s in zip(p["zero_convs"], hs)]
    outs.append(conv(p["middle_block_out"], h))
    if control_scales is not None:
        outs = [o * control_scales[i].astype(o.dtype) for i, o in enumerate(outs)]
    return outs
