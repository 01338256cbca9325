"""Preview sampling + the full-sheet stylization pipeline.

``sample_preview`` mirrors ``vis_metrics.sample_preview`` (``:408-452``): BERT-adapter cond,
zero-tensor uncond, DDIM with CFG, fp32 decode, clamp. ``sample_preview_cnlora`` adds the
pooled hint-block seg feature + mean text tokens injected into conditional LoRA leaves
(``sample_preview_CNLora``, ``vis_metrics.py:347-403``). ``preview_three_modes`` reproduces
the CLIP⊕BERT A/B/C comparison (``make_cond_uc_for_mode``/``preview_three_modes``,
``vis_metrics.py:526-612``).

``stylize_sheet`` is the end-to-end product pipeline (SURVEY.md §3.3) redesigned device-side:
the reference loops tile-by-tile on the GPU with a host round trip per tile
(``evaluateCN.py:66-120``); here the whole sheet is tiled, batched, sampled, decoded,
stitched and contour-composited without leaving the device (chunked only by a batch knob to
bound HBM).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from topomap_tpu.core import DDIMConfig, DiffusionSchedule
from topomap_tpu.lora import attach_condition
from topomap_tpu.models.controlnet import hint_block_apply
from topomap_tpu.ops.image import (
    add_contour_lines,
    from_signed,
    stitch_tiles,
    stitch_tiles_blend,
    tile_sheet,
    tile_sheet_overlap,
    to_unit,
)
from topomap_tpu.pipeline import PipelineConfig, Params, encode_clip, encode_text, sample
from topomap_tpu.text.fusion import fuse_pad


def sample_preview(
    params: Params,
    cfg: PipelineConfig,
    sched: DiffusionSchedule,
    batch: dict,
    steps: int = 30,
    scale: float = 7.5,
    eta: float = 0.0,
    seed: int = 1234,
    attn_fn=None,
    cfg_interval: int = 1,
    deep_cache_interval: int = 1,
    solver: str = "ddim",
) -> jnp.ndarray:
    """Returns decoded images [B,H,W,3] in [−1,1]. ``cfg_interval`` / ``deep_cache_interval``
    are the opt-in approximate speed knobs (lazy CFG / DeepCache — see ``DDIMConfig``);
    ``solver="dpm"`` switches to the second-order DPM-Solver++(2M) (exact model math)."""
    from topomap_tpu.ops.flash_attention import best_attention_fn

    c = encode_text(params, cfg, batch["ids"], batch["mask"])
    return sample(
        params,
        cfg,
        sched,
        DDIMConfig(num_steps=steps, guidance_scale=scale, eta=eta,
                   cfg_interval=cfg_interval, deep_cache_interval=deep_cache_interval,
                   solver=solver if solver in ("ddim", "dpm") else "ddim"),
        jax.random.PRNGKey(seed),
        batch["seg"],
        c,
        attn_fn=attn_fn or best_attention_fn(),
    )


def pooled_seg_feature(params: Params, cfg: PipelineConfig, seg: jnp.ndarray) -> jnp.ndarray:
    """CN-LoRA seg feature: spatially pooled ``input_hint_block`` output
    (``vis_metrics.py:368-372``). [B, model_channels]."""
    h = hint_block_apply(params["controlnet"]["input_hint_block"], seg, cfg.vae.downscale)
    return h.mean(axis=(1, 2))


def sample_preview_cnlora(
    params: Params,
    cfg: PipelineConfig,
    sched: DiffusionSchedule,
    batch: dict,
    steps: int = 30,
    scale: float = 7.5,
    seed: int = 1234,
) -> jnp.ndarray:
    """Preview with conditional-LoRA feature injection: cond = [seg_feat ; mean text tokens]."""
    c = encode_text(params, cfg, batch["ids"], batch["mask"])
    seg_feat = pooled_seg_feature(params, cfg, batch["seg"])
    cond_feat = jnp.concatenate([seg_feat, c.mean(axis=1)], axis=-1)
    p = dict(params)
    for coll in ("unet_lora", "ctrl_lora"):
        if coll in p:
            p[coll] = attach_condition(p[coll], cond_feat)
    return sample(
        p,
        cfg,
        sched,
        DDIMConfig(num_steps=steps, guidance_scale=scale),
        jax.random.PRNGKey(seed),
        batch["seg"],
        c,
    )


def preview_three_modes(
    params: Params,
    cfg: PipelineConfig,
    sched: DiffusionSchedule,
    batch: dict,
    clip_ids: jnp.ndarray,
    steps: int = 30,
    scale: float = 7.5,
    seed: int = 1234,
    gamma: float = 1.0,
    w_clip: float = 0.4,
) -> dict[str, jnp.ndarray]:
    """A/B/C fusion comparison (``vis_metrics.py:578-612``):
    A = pad-fusion main mode, B = BERT-only (w_clip→0), C = clip-weak (gamma→0)."""
    bert_tok = encode_text(params, cfg, batch["ids"], batch["mask"])
    clip_ctx = encode_clip(params, cfg, clip_ids)
    out = {}
    for mode, (g, w) in {
        "A": (gamma, w_clip),
        "B": (gamma, 0.0),
        "C": (0.0, w_clip),
    }.items():
        cond, uc = fuse_pad(clip_ctx, bert_tok, gamma=g, w_clip=w)
        out[mode] = sample(
            params,
            cfg,
            sched,
            DDIMConfig(num_steps=steps, guidance_scale=scale),
            jax.random.PRNGKey(seed),
            batch["seg"],
            cond,
            uncond_crossattn=uc,
        )
    return out


def stylize_sheet(
    params: Params,
    cfg: PipelineConfig,
    sched: DiffusionSchedule,
    sheet_seg_u8: jnp.ndarray,
    crossattn_fn,
    tile: int = 512,
    steps: int = 20,
    scale: float = 9.0,
    seed: int = 42,
    batch_tiles: int = 4,
    control_scales: Optional[jnp.ndarray] = None,
    contours_u8: Optional[jnp.ndarray] = None,
    attn_fn=None,
    overlap: int = 0,
    sampler: str = "ddim",
    cfg_interval: int = 1,
    deep_cache_interval: int = 1,
    sigma_data: float = 0.5,
    timestep_scaling: float = 10.0,
) -> jnp.ndarray:
    """Stylize a whole map sheet: [H,W,3] uint8 seg → [H,W,3] uint8 stylized.

    ``crossattn_fn(n) -> [n,T,D]`` supplies the (shared or per-tile) conditioning.
    Device-side path: tile → batched DDIM (chunks of ``batch_tiles``) → stitch →
    optional contour compositing (``addContourLines`` semantics).

    ``overlap > 0`` switches to overlapped tiling with feathered seam blending
    (:func:`topomap_tpu.ops.image.stitch_tiles_blend`) — an improvement over the
    reference's hard hstack/vstack seams (``stitchTiles.py:6-45``) at the cost of
    ~``1/(1-overlap/tile)²`` more tile evaluations.

    ``sampler="consistency"`` uses the few-step distilled student (``steps`` single
    evals/tile); ``cfg_interval``/``deep_cache_interval`` are the opt-in DDIM speed knobs.
    """
    from topomap_tpu.ops.flash_attention import best_attention_fn
    from topomap_tpu.pipeline import sample_consistency

    attn_fn = attn_fn or best_attention_fn()
    h, w = sheet_seg_u8.shape[:2]
    rows, cols = h // tile, w // tile
    if overlap > 0:
        tiles_u8, ys, xs = tile_sheet_overlap(sheet_seg_u8, tile, overlap)
        tiles = to_unit(tiles_u8)
    else:
        tiles = to_unit(tile_sheet(sheet_seg_u8, tile))  # [N,512,512,3] in [0,1]
    n = tiles.shape[0]
    ddim = DDIMConfig(num_steps=steps, guidance_scale=scale, cfg_interval=cfg_interval,
                      deep_cache_interval=deep_cache_interval,
                      solver="dpm" if sampler == "dpm" else "ddim")

    outs = []
    for start in range(0, n, batch_tiles):
        chunk = tiles[start : start + batch_tiles]
        c = crossattn_fn(chunk.shape[0])
        if sampler == "consistency":
            img = sample_consistency(
                params, cfg, sched, steps, jax.random.PRNGKey(seed + start), chunk, c,
                control_scales=control_scales, attn_fn=attn_fn,
                sigma_data=sigma_data, timestep_scaling=timestep_scaling,
            )
        else:
            img = sample(
                params,
                cfg,
                sched,
                ddim,
                jax.random.PRNGKey(seed + start),
                chunk,
                c,
                control_scales=control_scales,
                attn_fn=attn_fn,
            )
        outs.append(from_signed(img))
    all_tiles = jnp.concatenate(outs, axis=0)
    if overlap > 0:
        stylized = stitch_tiles_blend(all_tiles, ys, xs, overlap)
    else:
        stylized = stitch_tiles(all_tiles, rows, cols)
    if contours_u8 is not None:
        stylized = add_contour_lines(stylized, contours_u8)
    return stylized
