"""LDM from-scratch BERT tower (SDFusion ``x_transformer`` TransformerWrapper).

Capability mirror of ``/root/reference/SDFusion_bert/bert_network/x_transformer.py:219-552``
and ``network.py:46-69`` (``BERTTextEncoder``): the conditioning tower LDM ships for its
``BERTEmbedder`` — a from-scratch pre-norm transformer encoder, NOT HF BERT. Distinctive
(and why the HF-compatible tower in ``text_encoders.py`` cannot express it):

* attention inner dim is ``heads · dim_head`` (default 8·64 = 512) **independent of the
  model dim** — ``to_q/k/v: [dim → 512]`` without bias, ``to_out: [512 → dim]`` with bias;
* per-block pre-LayerNorm with interleaved [LN, block, residual] triplets
  (``attn_layers.layers.{2i}`` = attention, ``{2i+1}`` = GELU feed-forward, mult 4);
* learned absolute position embeddings, final LayerNorm, ``return_embeddings=True``
  (the ``to_logits`` head exists in checkpoints but is unused for conditioning).

Low product impact — every reference training script monkey-patches ``.encode`` to HF BERT
+ adapter (``multiseg_19prompts_batch1_shuffle_addlrSD.py:174-200``) — but LDM checkpoints
trained with ``cond_stage_config: BERTEmbedder`` carry these weights, and
:func:`ldm_bert_keymap` loads them (parity-tested against a torch twin in
``tests/test_torch_parity.py``).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from topomap_tpu.models.nn import KeyGen, Params, dense, dense_init, layer_norm, norm_init, rand_normal


@dataclasses.dataclass(frozen=True)
class LDMBertConfig:
    vocab_size: int = 30522
    dim: int = 1280          # LDM BERTEmbedder n_embed
    depth: int = 32          # LDM BERTEmbedder n_layer
    heads: int = 8
    dim_head: int = 64       # inner = heads * dim_head = 512, independent of dim
    ff_mult: int = 4
    max_len: int = 77

    @property
    def inner(self) -> int:
        return self.heads * self.dim_head

    @staticmethod
    def tiny() -> "LDMBertConfig":
        return LDMBertConfig(vocab_size=512, dim=48, depth=2, heads=2, dim_head=8, max_len=16)


def ldm_bert_init(key, cfg: LDMBertConfig) -> Params:
    kg = KeyGen(key)
    layers = []
    for _ in range(cfg.depth):
        layers.append(
            {
                "attn_ln": norm_init(cfg.dim),
                "attn": {
                    "to_q": {"w": dense_init(kg(), cfg.dim, cfg.inner)["w"]},  # no bias
                    "to_k": {"w": dense_init(kg(), cfg.dim, cfg.inner)["w"]},
                    "to_v": {"w": dense_init(kg(), cfg.dim, cfg.inner)["w"]},
                    "to_out": dense_init(kg(), cfg.inner, cfg.dim),
                },
                "ff_ln": norm_init(cfg.dim),
                "ff": {
                    "fc1": dense_init(kg(), cfg.dim, cfg.dim * cfg.ff_mult),
                    "fc2": dense_init(kg(), cfg.dim * cfg.ff_mult, cfg.dim),
                },
            }
        )
    return {
        "tok_emb": rand_normal(kg(), (cfg.vocab_size, cfg.dim), 0.02),
        "pos_emb": rand_normal(kg(), (cfg.max_len, cfg.dim), 0.02),
        "layers": layers,
        "final_ln": norm_init(cfg.dim),
    }


def ldm_bert_apply(
    p: Params, cfg: LDMBertConfig, ids: jnp.ndarray, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """``TransformerWrapper.forward(..., return_embeddings=True)``: [B, T] ids → [B, T, dim].

    The reference's ``BERTTextEncoder.encode`` passes no mask; ``mask`` (1 = keep) is
    supported for callers that want padding masked out of attention."""
    x = p["tok_emb"][ids] + p["pos_emb"][None, : ids.shape[1]]
    for lp in p["layers"]:
        h = layer_norm(lp["attn_ln"], x)  # pre-norm
        x = x + _attn(lp["attn"], cfg, h, mask)
        h = layer_norm(lp["ff_ln"], x)
        x = x + dense(lp["ff"]["fc2"], jax.nn.gelu(dense(lp["ff"]["fc1"], h), approximate=False))
    return layer_norm(p["final_ln"], x)


def _attn(p: Params, cfg: LDMBertConfig, x: jnp.ndarray, mask: jnp.ndarray | None):
    b, t, _ = x.shape
    q = jnp.dot(x, p["to_q"]["w"]).reshape(b, t, cfg.heads, cfg.dim_head).transpose(0, 2, 1, 3)
    k = jnp.dot(x, p["to_k"]["w"]).reshape(b, t, cfg.heads, cfg.dim_head).transpose(0, 2, 1, 3)
    v = jnp.dot(x, p["to_v"]["w"]).reshape(b, t, cfg.heads, cfg.dim_head).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * cfg.dim_head**-0.5
    if mask is not None:
        big_neg = jnp.finfo(logits.dtype).max * -0.5  # x_transformer max_neg_value
        logits = jnp.where(mask[:, None, None, :].astype(bool), logits, big_neg)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, t, cfg.inner)
    return dense(p["to_out"], o)


def ldm_bert_keymap(cfg: LDMBertConfig, prefix: str = "cond_stage_model.transformer"):
    """LDM checkpoint key space → this tree. Layer ModuleList layout: ``layers.{2i}`` =
    [LayerNorm, Attention, Residual], ``layers.{2i+1}`` = [LayerNorm, FeedForward(net =
    Sequential(Linear, GELU, Dropout, Linear)), Residual]."""
    from topomap_tpu.utils.torch_ckpt import _dense_entries, _norm_entries, _lin_in, _lin_out

    e = [
        (f"{prefix}.token_emb.weight", ("tok_emb",), lambda x: x, lambda x: x),
        (f"{prefix}.pos_emb.emb.weight", ("pos_emb",), lambda x: x, lambda x: x),
    ]
    for i in range(cfg.depth):
        a = f"{prefix}.attn_layers.layers.{2 * i}"
        f = f"{prefix}.attn_layers.layers.{2 * i + 1}"
        path = ("layers", i)
        e += _norm_entries(f"{a}.0", path + ("attn_ln",))
        for name in ("to_q", "to_k", "to_v"):
            e.append((f"{a}.1.{name}.weight", path + ("attn", name, "w"), _lin_in, _lin_out))
        e += _dense_entries(f"{a}.1.to_out", path + ("attn", "to_out"))
        e += _norm_entries(f"{f}.0", path + ("ff_ln",))
        e += _dense_entries(f"{f}.1.net.0", path + ("ff", "fc1"))
        e += _dense_entries(f"{f}.1.net.3", path + ("ff", "fc2"))
    e += _norm_entries(f"{prefix}.norm", ("final_ln",))
    return e
