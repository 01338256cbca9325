"""Independent torch twin of the assembled LDM UNet + ControlNet forward.

Functional NCHW re-implementation of the reference's ``model.apply_model`` contract
(``cldm.cldm.ControlledUnetModel`` + ``ControlNet``, used at
``/root/reference/LoRA_modified/multiseg_19prompts_batch1_shuffle_addlrSD.py:458-459``),
reading weights straight from an **LDM-format numpy state dict** — the same key space
``topomap_tpu.utils.torch_ckpt`` exports/imports. Used by ``test_torch_parity.py`` to
golden-check the assembled jax pipeline end-to-end: a wiring bug in skip ordering,
control-residual indexing, or the time-embed convention shows up here even when every
per-block parity test passes.

Deliberately written from the LDM module semantics (TimestepEmbedSequential input_blocks,
skip stack, output_blocks popping skips, zero-conv residuals), NOT from the jax code.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

from topomap_tpu.models.unet import UNetConfig, _level_channels


def _t(sd, key):
    return torch.from_numpy(np.asarray(sd[key], np.float32))


def t_conv(sd, pfx, x, stride=1):
    w = _t(sd, f"{pfx}.weight")
    pad = (w.shape[-1] - 1) // 2
    return F.conv2d(x, w, _t(sd, f"{pfx}.bias"), stride=stride, padding=pad)


def t_linear(sd, pfx, x, bias=True):
    return F.linear(x, _t(sd, f"{pfx}.weight"), _t(sd, f"{pfx}.bias") if bias else None)


def t_groupnorm(sd, pfx, x):
    # LDM GroupNorm32; at test scale, the largest divisor of C that is ≤ 32 (SD-scale
    # channel counts are all multiples of 32, where this is exactly 32 groups)
    c = x.shape[1]
    g = min(32, c)
    while c % g:
        g -= 1
    return F.group_norm(x, g, _t(sd, f"{pfx}.weight"), _t(sd, f"{pfx}.bias"), eps=1e-5)


def t_layernorm(sd, pfx, x):
    return F.layer_norm(x, (x.shape[-1],), _t(sd, f"{pfx}.weight"), _t(sd, f"{pfx}.bias"), eps=1e-5)


def t_timestep_embedding(t, dim, max_period=10000):
    """LDM convention: cos|sin halves, freqs exp(−ln(max_period)·i/half)."""
    half = dim // 2
    freqs = torch.exp(-math.log(max_period) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def t_resblock(sd, pfx, x, emb):
    h = t_conv(sd, f"{pfx}.in_layers.2", F.silu(t_groupnorm(sd, f"{pfx}.in_layers.0", x)))
    h = h + t_linear(sd, f"{pfx}.emb_layers.1", F.silu(emb))[:, :, None, None]
    h = t_conv(sd, f"{pfx}.out_layers.3", F.silu(t_groupnorm(sd, f"{pfx}.out_layers.0", h)))
    skip = t_conv(sd, f"{pfx}.skip_connection", x) if f"{pfx}.skip_connection.weight" in sd else x
    return skip + h


def t_attention(sd, pfx, x, context, heads):
    """LDM CrossAttention: no-bias q/k/v, per-head scaled dot product, to_out."""
    ctx = x if context is None else context
    q = t_linear(sd, f"{pfx}.to_q", x, bias=False)
    k = t_linear(sd, f"{pfx}.to_k", ctx, bias=False)
    v = t_linear(sd, f"{pfx}.to_v", ctx, bias=False)
    b, tq, inner = q.shape
    dh = inner // heads
    q = q.view(b, tq, heads, dh).transpose(1, 2)
    k = k.view(b, -1, heads, dh).transpose(1, 2)
    v = v.view(b, -1, heads, dh).transpose(1, 2)
    attn = torch.softmax(q @ k.transpose(-1, -2) * dh**-0.5, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, tq, inner)
    return t_linear(sd, f"{pfx}.to_out.0", out)


def t_transformer_block(sd, pfx, x, context, heads):
    x = x + t_attention(sd, f"{pfx}.attn1", t_layernorm(sd, f"{pfx}.norm1", x), None, heads)
    x = x + t_attention(sd, f"{pfx}.attn2", t_layernorm(sd, f"{pfx}.norm2", x), context, heads)
    h = t_linear(sd, f"{pfx}.ff.net.0.proj", t_layernorm(sd, f"{pfx}.norm3", x))
    h, gate = h.chunk(2, dim=-1)
    x = x + t_linear(sd, f"{pfx}.ff.net.2", h * F.gelu(gate))
    return x


def t_spatial_transformer(sd, pfx, x, context, heads, depth):
    b, c, hh, ww = x.shape
    x_in = x
    y = t_groupnorm(sd, f"{pfx}.norm", x)
    y = F.conv2d(y, _t(sd, f"{pfx}.proj_in.weight"), _t(sd, f"{pfx}.proj_in.bias"))
    y = y.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    for d in range(depth):
        y = t_transformer_block(sd, f"{pfx}.transformer_blocks.{d}", y, context, heads)
    y = y.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
    y = F.conv2d(y, _t(sd, f"{pfx}.proj_out.weight"), _t(sd, f"{pfx}.proj_out.bias"))
    return y + x_in


def _t_time_embed(sd, prefix, t, model_channels):
    temb = t_timestep_embedding(t, model_channels)
    return t_linear(sd, f"{prefix}.time_embed.2", F.silu(t_linear(sd, f"{prefix}.time_embed.0", temb)))


def _t_input_blocks(sd, prefix, cfg: UNetConfig, x, emb, context, extra_first=None):
    """LDM input_blocks: conv_in, then (ResBlock [+ SpatialTransformer]) or Downsample per
    plan entry; returns the list of skip activations."""
    h = t_conv(sd, f"{prefix}.input_blocks.0.0", x)
    if extra_first is not None:
        h = h + extra_first
    hs = [h]
    for i, (kind, _ci, _co, attn) in enumerate(_level_channels(cfg), start=1):
        pfx = f"{prefix}.input_blocks.{i}"
        if kind == "down":
            h = t_conv(sd, f"{pfx}.0.op", h, stride=2)
        else:
            h = t_resblock(sd, f"{pfx}.0", h, emb)
            if attn:
                h = t_spatial_transformer(
                    sd, f"{pfx}.1", h, context, cfg.num_heads, cfg.transformer_depth
                )
        hs.append(h)
    return hs


def _t_middle(sd, prefix, cfg: UNetConfig, h, emb, context):
    h = t_resblock(sd, f"{prefix}.middle_block.0", h, emb)
    h = t_spatial_transformer(
        sd, f"{prefix}.middle_block.1", h, context, cfg.num_heads, cfg.transformer_depth
    )
    return t_resblock(sd, f"{prefix}.middle_block.2", h, emb)


def t_unet_apply(sd, cfg: UNetConfig, x, t, context, control=None,
                 prefix="model.diffusion_model"):
    """ControlledUnetModel.forward: control[12] added to the middle output, control[0..11]
    added to the encoder skips as output_blocks pop them."""
    emb = _t_time_embed(sd, prefix, t, cfg.model_channels)
    hs = _t_input_blocks(sd, prefix, cfg, x, emb, context)
    h = _t_middle(sd, prefix, cfg, hs[-1], emb, context)
    if control is not None:
        control = list(control)
        h = h + control.pop()
        hs = [s + c for s, c in zip(hs, control)]
    i = 0
    ds = 2 ** (len(cfg.channel_mult) - 1)
    for li in reversed(range(len(cfg.channel_mult))):
        for bi in range(cfg.num_res_blocks + 1):
            pfx = f"{prefix}.output_blocks.{i}"
            h = t_resblock(sd, f"{pfx}.0", torch.cat([h, hs.pop()], dim=1), emb)
            sub = 1
            if ds in cfg.attention_ds:
                h = t_spatial_transformer(
                    sd, f"{pfx}.{sub}", h, context, cfg.num_heads, cfg.transformer_depth
                )
                sub += 1
            if li != 0 and bi == cfg.num_res_blocks:
                h = t_conv(sd, f"{pfx}.{sub}.conv", F.interpolate(h, scale_factor=2, mode="nearest"))
                ds //= 2
            i += 1
    h = F.silu(t_groupnorm(sd, f"{prefix}.out.0", h))
    return t_conv(sd, f"{prefix}.out.2", h)


def t_controlnet_apply(sd, cfg: UNetConfig, x, hint, t, context, hint_strides,
                       prefix="control_model"):
    """ControlNet.forward: hint block output added after conv_in; 12 zero-conv skip
    residuals + middle_block_out."""
    emb = _t_time_embed(sd, prefix, t, cfg.model_channels)
    guided = hint
    n = len(hint_strides)
    for ci, s in enumerate(hint_strides):
        guided = t_conv(sd, f"{prefix}.input_hint_block.{2*ci}", guided, stride=s)
        if ci < n - 1:
            guided = F.silu(guided)
    hs = _t_input_blocks(sd, prefix, cfg, x, emb, context, extra_first=guided)
    h = _t_middle(sd, prefix, cfg, hs[-1], emb, context)
    outs = [
        F.conv2d(s, _t(sd, f"{prefix}.zero_convs.{zi}.0.weight"),
                 _t(sd, f"{prefix}.zero_convs.{zi}.0.bias"))
        for zi, s in enumerate(hs)
    ]
    outs.append(
        F.conv2d(h, _t(sd, f"{prefix}.middle_block_out.0.weight"),
                 _t(sd, f"{prefix}.middle_block_out.0.bias"))
    )
    return outs


def t_apply_model(sd, cfg: UNetConfig, x, hint, t, context, hint_strides):
    """The reference's ``model.apply_model(x_noisy, t, cond)`` composite."""
    control = t_controlnet_apply(sd, cfg, x, hint, t, context, hint_strides)
    return t_unet_apply(sd, cfg, x, t, context, control=control)
