"""AutoencoderKL — the SD first-stage VAE (encode to 4-ch latents at /8, decode back).

Capability mirror of the vendored LDM first stage the reference calls as
``model.encode_first_stage`` / ``get_first_stage_encoding`` / ``decode_first_stage``
(training loop ``multiseg_19prompts_batch1_shuffle_addlrSD.py:437-438``, preview decode
``vis_metrics.py:450-452``). Architecture parameterized so tests run a tiny copy; SD1.5
defaults: base 128 channels, mult (1,2,4,4), 2 res-blocks, one single-head attention block in
the bottleneck, z=4, scale factor 0.18215.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from topomap_tpu.models.nn import KeyGen, Params, conv, conv_init, group_norm, norm_init, silu

SD_SCALE_FACTOR = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    base_channels: int = 128
    channel_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    scale_factor: float = SD_SCALE_FACTOR

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(base_channels=16, channel_mult=(1, 2), num_res_blocks=1)

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.channel_mult) - 1)


def _res_init(kg: KeyGen, c_in: int, c_out: int) -> Params:
    p = {
        "norm1": norm_init(c_in),
        "conv1": conv_init(kg(), c_in, c_out, 3),
        "norm2": norm_init(c_out),
        "conv2": conv_init(kg(), c_out, c_out, 3),
    }
    if c_in != c_out:
        p["skip"] = conv_init(kg(), c_in, c_out, 1)
    return p


def _res(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = conv(p["conv1"], silu(group_norm(p["norm1"], x)))
    h = conv(p["conv2"], silu(group_norm(p["norm2"], h)))
    return (conv(p["skip"], x) if "skip" in p else x) + h


def _attn_init(kg: KeyGen, c: int) -> Params:
    return {
        "norm": norm_init(c),
        "q": conv_init(kg(), c, c, 1),
        "k": conv_init(kg(), c, c, 1),
        "v": conv_init(kg(), c, c, 1),
        "out": conv_init(kg(), c, c, 1),
    }


def _attn(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Single-head full spatial attention (VAE bottleneck)."""
    b, h, w, c = x.shape
    y = group_norm(p["norm"], x)
    q = conv(p["q"], y).reshape(b, h * w, c)
    k = conv(p["k"], y).reshape(b, h * w, c)
    v = conv(p["v"], y).reshape(b, h * w, c)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) * (c**-0.5)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    y = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
    return x + conv(p["out"], y)


def vae_init(key, cfg: VAEConfig = VAEConfig()) -> Params:
    kg = KeyGen(key)
    bc = cfg.base_channels
    # Encoder
    enc_blocks = []
    ch = bc
    for li, mult in enumerate(cfg.channel_mult):
        out = bc * mult
        level = {"res": [_res_init(kg, ch if i == 0 else out, out) for i in range(cfg.num_res_blocks)]}
        ch = out
        if li != len(cfg.channel_mult) - 1:
            level["down"] = conv_init(kg(), ch, ch, 3)
        enc_blocks.append(level)
    # Decoder (reverse mults, num_res_blocks+1 per level as in LDM decoder)
    dec_blocks = []
    dch = bc * cfg.channel_mult[-1]
    for li, mult in enumerate(reversed(cfg.channel_mult)):
        out = bc * mult
        level = {"res": [_res_init(kg, dch if i == 0 else out, out) for i in range(cfg.num_res_blocks + 1)]}
        dch = out
        if li != len(cfg.channel_mult) - 1:
            level["up"] = conv_init(kg(), dch, dch, 3)
        dec_blocks.append(level)
    mid_ch = bc * cfg.channel_mult[-1]
    return {
        "encoder": {
            "conv_in": conv_init(kg(), cfg.in_channels, bc, 3),
            "down": enc_blocks,
            "mid": {"res1": _res_init(kg, mid_ch, mid_ch), "attn": _attn_init(kg, mid_ch), "res2": _res_init(kg, mid_ch, mid_ch)},
            "norm_out": norm_init(mid_ch),
            "conv_out": conv_init(kg(), mid_ch, 2 * cfg.z_channels, 3),
        },
        "quant_conv": conv_init(kg(), 2 * cfg.z_channels, 2 * cfg.z_channels, 1),
        "post_quant_conv": conv_init(kg(), cfg.z_channels, cfg.z_channels, 1),
        "decoder": {
            "conv_in": conv_init(kg(), cfg.z_channels, mid_ch, 3),
            "mid": {"res1": _res_init(kg, mid_ch, mid_ch), "attn": _attn_init(kg, mid_ch), "res2": _res_init(kg, mid_ch, mid_ch)},
            "up": dec_blocks,
            "norm_out": norm_init(bc),
            "conv_out": conv_init(kg(), bc, cfg.in_channels, 3),
        },
    }


def vae_encode(p: Params, cfg: VAEConfig, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Image [B,H,W,3] in [−1,1] → posterior (mean, logvar), each [B,H/8,W/8,z]."""
    e = p["encoder"]
    h = conv(e["conv_in"], x)
    for level in e["down"]:
        for rp in level["res"]:
            h = _res(rp, h)
        if "down" in level:
            # LDM uses asymmetric pad (0,1) then stride-2 VALID; plain SAME stride-2 differs
            # by edge alignment — we reproduce LDM's to stay checkpoint-compatible.
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv(level["down"], h, stride=2, padding="VALID")
    m = e["mid"]
    h = _res(m["res2"], _attn(m["attn"], _res(m["res1"], h)))
    h = conv(e["conv_out"], silu(group_norm(e["norm_out"], h)))
    h = conv(p["quant_conv"], h)
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def vae_sample_latent(rng, mean, logvar, scale_factor: float = SD_SCALE_FACTOR):
    """``get_first_stage_encoding``: sample posterior then multiply by scale factor."""
    z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
    return z * scale_factor


def vae_decode(p: Params, cfg: VAEConfig, z: jnp.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
    """Latent [B,h,w,z] (scaled) → image [B,8h,8w,3] in ≈[−1,1].

    fp32 by default (the reference decodes fp32, ``vis_metrics.py:450``); pass
    ``compute_dtype=jnp.bfloat16`` for the serving path (GroupNorm statistics stay fp32;
    output is fp32 either way)."""
    z = (z / cfg.scale_factor).astype(compute_dtype)
    d = p["decoder"]
    h = conv(d["conv_in"], conv(p["post_quant_conv"], z))
    m = d["mid"]
    h = _res(m["res2"], _attn(m["attn"], _res(m["res1"], h)))
    for level in d["up"]:
        for rp in level["res"]:
            h = _res(rp, h)
        if "up" in level:
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            h = conv(level["up"], h)
    return conv(d["conv_out"], silu(group_norm(d["norm_out"], h))).astype(jnp.float32)
