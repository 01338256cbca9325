"""CLIP⊕BERT conditioning-fusion modes.

Pure-jnp re-implementations of the reference's fusion family
(``TextEncoder_Finetuning/token_utils.py`` + the tokenadd/tokenjoint/embfussion training
scripts). Each returns ``(cond_ctx, uc_ctx)`` cross-attention contexts; packaging into the
``{"crossattn": ..., "concat": seg}`` conditioning dict happens in the pipeline layer.

All functions are static-shape and batched — the per-sample Python loops of the reference
(``token_utils.py:61-65,72-76``) become masked writes, so they jit and shard cleanly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from topomap_tpu.models.nn import Params, dense


def _ln(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Parameter-free ``F.layer_norm(x, (dim,))`` over the last axis."""
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def fuse_pad(
    clip_ctx: jnp.ndarray,
    bert_tok: jnp.ndarray,
    gamma: float = 1.0,
    w_clip: float = 0.4,
    start_idx: int = 8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Active pad-slot fusion — ``build_cond_uc_safe_pad`` (``token_utils.py:115-158``).

    BERT tokens (already adapter/align-processed) are LayerNormed and written into a zero
    "tail" occupying slots ``[start_idx, 77)``; then
    ``cond = w_clip·clip_ctx + gamma·tail``, ``uc = w_clip·clip_ctx`` — the CFG differential
    comes ONLY from BERT.
    """
    b, max_len, d = clip_ctx.shape
    bert_tok = _ln(bert_tok)
    lb = bert_tok.shape[1]
    tail = jnp.zeros_like(clip_ctx)
    end = min(max_len, start_idx + lb)
    if end > start_idx:
        tail = tail.at[:, start_idx:end, :].set(bert_tok[:, : end - start_idx, :])
    cond = w_clip * clip_ctx + gamma * tail
    uc = w_clip * clip_ctx
    return cond, uc


def fuse_pad_soft(
    clip_ctx: jnp.ndarray,
    uc_clip_ctx: jnp.ndarray,
    bert_tok: jnp.ndarray,
    start: jnp.ndarray,
    gamma: float = 0.25,
    uc_mix: float = 0.15,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Soft-CFG pad fusion — ``fuse_clip_bert_in_pad`` (``token_utils.py:32-78``).

    Per-sample dynamic write start ``start = first_eos+1`` (clamped ≤76): cond REPLACES the
    CLIP pad slots with ``gamma·LN(bert)``; uc ADDS ``uc_mix·gamma·LN(bert)`` onto the
    empty-prompt CLIP context in the same slots.
    """
    b, max_len, d = clip_ctx.shape
    bert_tok = gamma * _ln(bert_tok)
    lb = bert_tok.shape[1]
    pos = jnp.arange(max_len)[None, :]  # [1, 77]
    start = jnp.clip(start, 0, max_len - 1)[:, None]  # [B, 1]
    in_slot = (pos >= start) & (pos < start + lb)  # [B, 77]
    # Gather bert token for slot j: index j - start (clipped; masked out elsewhere).
    rel = jnp.clip(pos - start, 0, lb - 1)  # [B, 77]
    bert_at_slot = jnp.take_along_axis(bert_tok, rel[..., None], axis=1)  # [B, 77, D]
    cond = jnp.where(in_slot[..., None], bert_at_slot, clip_ctx)
    uc = uc_clip_ctx + jnp.where(in_slot[..., None], uc_mix * bert_at_slot, 0.0)
    return cond, uc


def fuse_tokenadd(clip_ctx: jnp.ndarray, bert_ctx77: jnp.ndarray):
    """Additive fusion — commented variant at ``token_utils.py:187-225``:
    ``cond = clip + bert`` (length stays 77), ``uc = clip``. ``bert_ctx77`` must already be
    length-aligned (``token_align``)."""
    return clip_ctx + bert_ctx77, clip_ctx


def fuse_tokenjoint(clip_ctx: jnp.ndarray, bert_ctx: jnp.ndarray):
    """Sequence-concat fusion — commented variant at ``token_utils.py:226-264``:
    ``cond = [CLIP(77) ; BERT(Lb)]``, ``uc = [CLIP(77) ; 0]``."""
    cond = jnp.concatenate([clip_ctx, bert_ctx], axis=1)
    uc = jnp.concatenate([clip_ctx, jnp.zeros_like(bert_ctx)], axis=1)
    return cond, uc


def embfussion_init(dim: int = 768, beta_init: float = -1.5) -> Params:
    """Trainable state of the gated-residual fusion (``Training_sd_bert_embfussion.py:296-300``):
    zero-init bias-free 768×768 adapter + scalar gate β (sigmoid(−1.5)≈0.18)."""
    return {
        "adapter": {"w": jnp.zeros((dim, dim), jnp.float32)},
        "beta": jnp.asarray(beta_init, jnp.float32),
    }


def fuse_embfussion(p: Params, clip_ctx: jnp.ndarray, bert_ctx77: jnp.ndarray):
    """``c = LN(clip) + sigmoid(β) · adapter(LN(bert)) · norm_ratio`` with
    ``norm_ratio = clamp(‖LN(clip)‖/‖LN(bert)‖, 0.5, 2)`` (``embfussion.py:415-420``).
    uc = LN(clip)."""
    base = _ln(clip_ctx)
    bert = _ln(bert_ctx77)
    aligned = jnp.dot(bert, p["adapter"]["w"].astype(bert.dtype))
    beta = jax.nn.sigmoid(p["beta"])
    norm_ratio = jnp.clip(
        jnp.linalg.norm(base) / (jnp.linalg.norm(bert) + 1e-6), 0.5, 2.0
    )
    return base + beta * aligned * norm_ratio, base


def add_style_prefix(prompts: list[str], prefix: str = "map in swiss topo style, ") -> list[str]:
    """CLIP-finetune variant's automatic prompt prefix (``Training_sdfusion_clip.py:64,195-203``)."""
    return [prefix + p if p and not p.startswith(prefix) else (p or prefix.rstrip(", ")) for p in prompts]
