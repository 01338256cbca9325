"""SD1.5-architecture UNet (epsilon-prediction), functional and size-parameterized.

Re-implements the capability of the vendored LDM ``UNetModel`` the reference builds via
``cldm.model.create_model`` from ``cldm_v15.yaml`` (SURVEY.md §0 fact 2): 4-ch latent in/out,
model_channels 320, channel_mult (1,2,4,4), 2 res-blocks/level, SpatialTransformer cross-attn
(context 768) at downsample factors 1/2/4, 8 heads, sinusoidal time embedding.

TPU-first choices: NHWC layout throughout; the encoder/middle is factored into
``unet_encoder_*`` functions shared verbatim with the ControlNet copy
(``topomap_tpu.models.controlnet``); ControlNet residuals enter as an optional list of 13
tensors (12 skip residuals + 1 middle) added exactly where the ControlNet convention adds them.
LoRA enters as an optional parallel pytree (see ``topomap_tpu.lora``), never as module hooks.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from topomap_tpu.models.attention import AttnFn, spatial_transformer, spatial_transformer_init, xla_attention, _idx
from topomap_tpu.models.nn import (
    KeyGen,
    Params,
    conv,
    conv_init,
    dense,
    dense_init,
    group_norm,
    norm_init,
    silu,
    timestep_embedding,
)
from topomap_tpu.ops.fused_norm import group_norm_silu


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_ds: tuple[int, ...] = (1, 2, 4)  # downsample factors with attention
    channel_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    context_dim: int = 768
    transformer_depth: int = 1

    @staticmethod
    def tiny(context_dim: int = 32) -> "UNetConfig":
        """Test-size config: same topology, ~100k params."""
        return UNetConfig(
            model_channels=16,
            num_res_blocks=1,
            attention_ds=(1, 2),
            channel_mult=(1, 2),
            num_heads=2,
            context_dim=context_dim,
        )


# ---------------------------------------------------------------------------
# ResBlock
# ---------------------------------------------------------------------------


def resblock_init(kg: KeyGen, c_in: int, c_out: int, emb_dim: int) -> Params:
    p = {
        "in_norm": norm_init(c_in),
        "in_conv": conv_init(kg(), c_in, c_out, 3),
        "emb": dense_init(kg(), emb_dim, c_out),
        "out_norm": norm_init(c_out),
        "out_conv": conv_init(kg(), c_out, c_out, 3, zero=True),  # LDM zero_module
    }
    if c_in != c_out:
        p["skip"] = conv_init(kg(), c_in, c_out, 1)
    return p


def resblock(p: Params, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
    if emb.shape[0] != x.shape[0]:
        # CFG shared-prefix fork (models.attention.transformer_block): post-fork blocks run
        # at batch 2B while the time embedding was computed once at B (cond/uncond share t).
        emb = jnp.concatenate([emb] * (x.shape[0] // emb.shape[0]), axis=0)
    h = conv(p["in_conv"], group_norm_silu(p["in_norm"], x))
    h = h + dense(p["emb"], silu(emb))[:, None, None, :].astype(h.dtype)
    h = conv(p["out_conv"], group_norm_silu(p["out_norm"], h))
    skip = conv(p["skip"], x) if "skip" in p else x
    return skip + h


# ---------------------------------------------------------------------------
# Encoder (shared by UNet and ControlNet)
# ---------------------------------------------------------------------------


def _level_channels(cfg: UNetConfig) -> list[tuple[int, int, bool]]:
    """Flatten the input-block plan: list of (c_in, c_out, has_attn) per res-block,
    with ``None``-marked downsample entries between levels. Returns the plan the same way
    LDM builds ``input_blocks``."""
    plan = []
    ch = cfg.model_channels
    ds = 1
    for li, mult in enumerate(cfg.channel_mult):
        out = cfg.model_channels * mult
        for _ in range(cfg.num_res_blocks):
            plan.append(("res", ch, out, ds in cfg.attention_ds))
            ch = out
        if li != len(cfg.channel_mult) - 1:
            plan.append(("down", ch, ch, False))
            ds *= 2
    return plan


def unet_encoder_init(kg: KeyGen, cfg: UNetConfig, emb_dim: int) -> tuple[Params, list[int]]:
    """Init input_blocks. Returns (params, skip_channels) where skip_channels lists the
    channel count of every stored skip activation (len = 1 + len(plan))."""
    blocks: list[Params] = [{"conv_in": conv_init(kg(), cfg.in_channels, cfg.model_channels, 3)}]
    skips = [cfg.model_channels]
    for kind, c_in, c_out, attn in _level_channels(cfg):
        if kind == "down":
            blocks.append({"down": conv_init(kg(), c_in, c_out, 3)})
        else:
            b: Params = {"res": resblock_init(kg, c_in, c_out, emb_dim)}
            if attn:
                b["attn"] = spatial_transformer_init(
                    kg, c_out, cfg.context_dim, cfg.num_heads, cfg.transformer_depth
                )
            blocks.append(b)
        skips.append(c_out)
    return {"blocks": blocks}, skips


def shallow_split(cfg: UNetConfig) -> tuple[int, int]:
    """(encoder blocks at the full-latent-resolution level incl conv_in,
    decoder blocks at that level). The deep-cache boundary (DeepCache, arXiv:2312.00858):
    everything between — deeper encoder levels, middle, deeper decoder — is cached across
    DDIM steps while the level-0 blocks recompute every step."""
    return 1 + cfg.num_res_blocks, cfg.num_res_blocks + 1


def unet_encoder_apply(
    p: Params,
    cfg: UNetConfig,
    x: jnp.ndarray,
    emb: jnp.ndarray,
    context: jnp.ndarray,
    lora: Optional[Params] = None,
    attn_fn: AttnFn = xla_attention,
    extra_first: Optional[jnp.ndarray] = None,
    remat: bool = False,
    start: int = 0,
    stop: Optional[int] = None,
    zero_ctx_tail: int = 0,
) -> list[jnp.ndarray]:
    """Run input_blocks ``[start:stop)``, returning the list of skip activations (one per
    block run). With ``start > 0``, ``x`` is the running hidden state entering that block.

    ``extra_first`` is the ControlNet hint-block output added after conv_in.
    ``remat=True`` checkpoints each res+attn block (activations recomputed in backward) —
    the TPU answer to the reference's memory ceiling that forced batch 1 (it disabled LDM
    gradient checkpointing outright, ``addlrSD.py:8-22``; we re-enable it selectively)."""
    lora_blocks = (lora or {}).get("blocks", {})

    def res_attn(bp, bl, h, emb, context):
        h = resblock(bp["res"], h, emb)
        if "attn" in bp:
            h = spatial_transformer(
                bp["attn"], h, context, cfg.num_heads,
                None if bl is None else bl.get("attn"), attn_fn,
                zero_ctx_tail=zero_ctx_tail,
            )
        return h

    if remat:
        res_attn = jax.checkpoint(res_attn)

    blocks = p["blocks"]
    stop = len(blocks) if stop is None else stop
    hs = []
    h = x
    for i in range(start, stop):
        bp = blocks[i]
        if "conv_in" in bp:
            h = conv(bp["conv_in"], h)
            if extra_first is not None:
                h = h + extra_first
        elif "down" in bp:
            # LDM Downsample: symmetric padding=1 (NOT XLA "SAME", whose (0,1) pad
            # shifts every window by one pixel at stride 2 — assembled-parity-tested)
            h = conv(bp["down"], h, stride=2, padding=1)
        else:
            h = res_attn(bp, _idx(lora_blocks, i), h, emb, context)
        hs.append(h)
    return hs


def unet_middle_init(kg: KeyGen, cfg: UNetConfig, emb_dim: int) -> Params:
    ch = cfg.model_channels * cfg.channel_mult[-1]
    return {
        "res1": resblock_init(kg, ch, ch, emb_dim),
        "attn": spatial_transformer_init(kg, ch, cfg.context_dim, cfg.num_heads, cfg.transformer_depth),
        "res2": resblock_init(kg, ch, ch, emb_dim),
    }


def unet_middle_apply(
    p: Params, cfg: UNetConfig, h, emb, context, lora=None, attn_fn: AttnFn = xla_attention,
    zero_ctx_tail: int = 0,
):
    lora = lora or {}
    h = resblock(p["res1"], h, emb)
    h = spatial_transformer(p["attn"], h, context, cfg.num_heads, lora.get("attn"), attn_fn,
                            zero_ctx_tail=zero_ctx_tail)
    return resblock(p["res2"], h, emb)


# ---------------------------------------------------------------------------
# Full UNet
# ---------------------------------------------------------------------------


def unet_init(key, cfg: UNetConfig = UNetConfig()) -> Params:
    kg = KeyGen(key)
    emb_dim = cfg.model_channels * 4
    enc, skips = unet_encoder_init(kg, cfg, emb_dim)

    # Decoder: for each level (reversed), num_res_blocks+1 blocks consuming skips.
    out_blocks: list[Params] = []
    ch = cfg.model_channels * cfg.channel_mult[-1]
    ds = 2 ** (len(cfg.channel_mult) - 1)
    skip_stack = list(skips)
    for li in reversed(range(len(cfg.channel_mult))):
        out = cfg.model_channels * cfg.channel_mult[li]
        for bi in range(cfg.num_res_blocks + 1):
            skip_ch = skip_stack.pop()
            b: Params = {"res": resblock_init(kg, ch + skip_ch, out, emb_dim)}
            ch = out
            if ds in cfg.attention_ds:
                b["attn"] = spatial_transformer_init(
                    kg, out, cfg.context_dim, cfg.num_heads, cfg.transformer_depth
                )
            if li != 0 and bi == cfg.num_res_blocks:
                b["up"] = conv_init(kg(), out, out, 3)
                ds //= 2
            out_blocks.append(b)

    return {
        "time_embed": {
            "fc1": dense_init(kg(), cfg.model_channels, emb_dim),
            "fc2": dense_init(kg(), emb_dim, emb_dim),
        },
        "encoder": enc,
        "middle": unet_middle_init(kg, cfg, emb_dim),
        "decoder": {"blocks": out_blocks},
        "out_norm": norm_init(cfg.model_channels),
        "out_conv": conv_init(kg(), cfg.model_channels, cfg.out_channels, 3, zero=True),
    }


def _upsample(h: jnp.ndarray) -> jnp.ndarray:
    b, hh, ww, c = h.shape
    h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
    return h


def unet_time_embed(p: Params, cfg: UNetConfig, t: jnp.ndarray, compute_dtype=jnp.float32):
    temb = timestep_embedding(t, cfg.model_channels)
    return dense(p["time_embed"]["fc2"], silu(dense(p["time_embed"]["fc1"], temb))).astype(
        compute_dtype
    )


def unet_decoder_apply(
    p: Params,
    cfg: UNetConfig,
    h: jnp.ndarray,
    hs: list[jnp.ndarray],
    emb: jnp.ndarray,
    context: jnp.ndarray,
    lora: Optional[Params] = None,
    attn_fn: AttnFn = xla_attention,
    remat: bool = False,
    start: int = 0,
    stop: Optional[int] = None,
    zero_ctx_tail: int = 0,
) -> jnp.ndarray:
    """Run output_blocks ``[start:stop)``; consumes skips from the END of ``hs`` (popped).
    Returns the running hidden state (callers apply the out norm/conv head)."""
    lora = lora or {}

    def dec_block(bp, bl, h, skip, emb, context):
        if skip.shape[0] != h.shape[0]:
            # pre-fork skips (conv_in output under the CFG shared-prefix fork) are batch B
            skip = jnp.concatenate([skip] * (h.shape[0] // skip.shape[0]), axis=0)
        h = jnp.concatenate([h, skip], axis=-1)
        h = resblock(bp["res"], h, emb)
        if "attn" in bp:
            h = spatial_transformer(
                bp["attn"], h, context, cfg.num_heads,
                None if bl is None else bl.get("attn"), attn_fn,
                zero_ctx_tail=zero_ctx_tail,
            )
        return h

    if remat:
        dec_block = jax.checkpoint(dec_block)

    hs = list(hs)
    dec_lora = lora.get("blocks", {})  # takes the DECODER subtree, like encoder_apply
    blocks = p["blocks"]
    stop = len(blocks) if stop is None else stop
    for i in range(start, stop):
        bp = blocks[i]
        h = dec_block(bp, _idx(dec_lora, i), h, hs.pop(), emb, context)
        if "up" in bp:
            h = conv(bp["up"], _upsample(h))
    return h


def unet_apply(
    p: Params,
    cfg: UNetConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    control: Optional[Sequence[jnp.ndarray]] = None,
    lora: Optional[Params] = None,
    attn_fn: AttnFn = xla_attention,
    compute_dtype=jnp.float32,
    remat: bool = False,
    zero_ctx_tail: int = 0,
) -> jnp.ndarray:
    """Predict epsilon. x [B,h,w,4] latent, t [B] int32, context [B,T,ctx].

    ``control``: optional 13 ControlNet residuals — [0..11] added to the 12 encoder skips,
    [12] added to the middle-block output (the ControlNet wiring convention).
    ``lora``: optional pytree with subtrees ``encoder`` / ``middle`` / ``decoder`` mirroring
    the attention structure.
    """
    lora = lora or {}
    x = x.astype(compute_dtype)
    context = context.astype(compute_dtype)
    emb = unet_time_embed(p, cfg, t, compute_dtype)

    hs = unet_encoder_apply(
        p["encoder"], cfg, x, emb, context, lora.get("encoder"), attn_fn, remat=remat,
        zero_ctx_tail=zero_ctx_tail,
    )
    h = unet_middle_apply(p["middle"], cfg, hs[-1], emb, context, lora.get("middle"), attn_fn,
                          zero_ctx_tail=zero_ctx_tail)

    if control is not None:
        h = h + control[-1].astype(h.dtype)
        hs = [s + c.astype(s.dtype) for s, c in zip(hs, control[:-1])]

    h = unet_decoder_apply(
        p["decoder"], cfg, h, hs, emb, context, lora.get("decoder"), attn_fn, remat=remat,
        zero_ctx_tail=zero_ctx_tail,
    )
    h = group_norm_silu(p["out_norm"], h)
    return conv(p["out_conv"], h).astype(jnp.float32)
