"""BERT and CLIP text encoders — functional JAX, size-parameterized, checkpoint-loadable.

Capability mirror of the reference's text stack (SURVEY.md §2.3): a frozen HF
``bert-base-uncased`` whose ``last_hidden_state`` feeds a trainable adapter
(``multiseg_19prompts_batch1_shuffle_addlrSD.py:174-200``), and the LDM
``FrozenCLIPEmbedder`` (CLIP ViT-L/14 text tower) used for ``get_learned_conditioning``
and the CLIP⊕BERT fusion modes. Both are implemented here from scratch:

* ``bert_encode`` — post-LayerNorm bidirectional transformer, learned position + token-type
  embeddings, GELU intermediate (BERT-base: 12×768×12, vocab 30522).
* ``clip_text_encode`` — pre-LayerNorm causal transformer with quickGELU (CLIP-L: 12×768×12,
  vocab 49408), optional penultimate-layer output.

"Frozen" is a call-site property (``jax.lax.stop_gradient`` on the params or exclusion from
the optimizer's trainable mask) — the framework keeps them on device but out of the
differentiated graph (SURVEY.md §7 risk list).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from topomap_tpu.models.nn import KeyGen, Params, dense, dense_init, layer_norm, norm_init, rand_normal


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_len: int = 77
    causal: bool = False          # True for CLIP
    pre_layernorm: bool = False   # True for CLIP
    quick_gelu: bool = False      # True for CLIP
    token_type: bool = True       # BERT token-type embeddings

    @staticmethod
    def bert_base() -> "TextEncoderConfig":
        return TextEncoderConfig()

    @staticmethod
    def clip_l() -> "TextEncoderConfig":
        return TextEncoderConfig(
            vocab_size=49408, causal=True, pre_layernorm=True, quick_gelu=True, token_type=False
        )

    @staticmethod
    def tiny(vocab_size: int = 512, causal: bool = False) -> "TextEncoderConfig":
        return TextEncoderConfig(
            vocab_size=vocab_size, hidden=32, layers=2, heads=2, intermediate=64,
            causal=causal, pre_layernorm=causal, quick_gelu=causal, token_type=not causal,
        )


def _act(cfg: TextEncoderConfig, x):
    if cfg.quick_gelu:
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def _layer_init(kg: KeyGen, cfg: TextEncoderConfig) -> Params:
    h = cfg.hidden
    return {
        "attn": {
            "q": dense_init(kg(), h, h),
            "k": dense_init(kg(), h, h),
            "v": dense_init(kg(), h, h),
            "out": dense_init(kg(), h, h),
        },
        "ln1": norm_init(h),
        "mlp": {
            "fc1": dense_init(kg(), h, cfg.intermediate),
            "fc2": dense_init(kg(), cfg.intermediate, h),
        },
        "ln2": norm_init(h),
    }


def text_encoder_init(key, cfg: TextEncoderConfig) -> Params:
    kg = KeyGen(key)
    p: Params = {
        "tok_emb": rand_normal(kg(), (cfg.vocab_size, cfg.hidden), 0.02),
        "pos_emb": rand_normal(kg(), (cfg.max_len, cfg.hidden), 0.02),
        "layers": [_layer_init(kg, cfg) for _ in range(cfg.layers)],
        "final_ln": norm_init(cfg.hidden),
    }
    if cfg.token_type:
        p["type_emb"] = rand_normal(kg(), (2, cfg.hidden), 0.02)
        p["emb_ln"] = norm_init(cfg.hidden)
    return p


def _self_attn(p: Params, cfg: TextEncoderConfig, x: jnp.ndarray, mask: jnp.ndarray | None):
    b, t, h = x.shape
    dh = h // cfg.heads
    q = dense(p["q"], x).reshape(b, t, cfg.heads, dh).transpose(0, 2, 1, 3)
    k = dense(p["k"], x).reshape(b, t, cfg.heads, dh).transpose(0, 2, 1, 3)
    v = dense(p["v"], x).reshape(b, t, cfg.heads, dh).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * dh**-0.5
    if cfg.causal:
        causal = jnp.tril(jnp.ones((t, t), bool))
        logits = jnp.where(causal[None, None], logits, -1e9)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :].astype(bool), logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, t, h)
    return dense(p["out"], o)


def text_encoder_apply(
    p: Params,
    cfg: TextEncoderConfig,
    ids: jnp.ndarray,
    attn_mask: jnp.ndarray | None = None,
    penultimate: bool = False,
) -> jnp.ndarray:
    """ids [B, T] int32 → last hidden states [B, T, hidden] (float32).

    ``penultimate=True`` returns the layer-(L−1) output with the final LN applied — the
    "clip-skip" convention some SD variants use.
    """
    b, t = ids.shape
    x = p["tok_emb"][ids] + p["pos_emb"][None, :t]
    if cfg.token_type:
        x = x + p["type_emb"][0][None, None]
        x = layer_norm(p["emb_ln"], x)
    hidden_states = []
    for lp in p["layers"]:
        if cfg.pre_layernorm:  # CLIP block
            x = x + _self_attn(lp["attn"], cfg, layer_norm(lp["ln1"], x), attn_mask)
            y = layer_norm(lp["ln2"], x)
            x = x + dense(lp["mlp"]["fc2"], _act(cfg, dense(lp["mlp"]["fc1"], y)))
        else:  # BERT post-LN block
            x = layer_norm(lp["ln1"], x + _self_attn(lp["attn"], cfg, x, attn_mask))
            x = layer_norm(lp["ln2"], x + dense(lp["mlp"]["fc2"], _act(cfg, dense(lp["mlp"]["fc1"], x))))
        hidden_states.append(x)
    if penultimate and len(hidden_states) >= 2:
        return layer_norm(p["final_ln"], hidden_states[-2])
    if cfg.pre_layernorm:
        return layer_norm(p["final_ln"], x)
    return x  # BERT last_hidden_state has no extra final LN


# Convenience aliases matching the capability surface.
bert_encode = text_encoder_apply
clip_text_encode = text_encoder_apply
