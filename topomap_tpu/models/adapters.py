"""Trainable text-conditioning adapters — the ONLY trainable text components in most configs.

Mirrors the reference's adapter zoo (SURVEY.md §2.3):

* ``LastStateAdapter`` — N blocks of (Linear → ReLU → LayerNorm) + final Linear + final
  LayerNorm ("mimics CLIP's final LayerNorm"), applied to frozen BERT
  ``last_hidden_state`` (``multiseg_19prompts_batch1_shuffle_addlrSD.py:137-171``: 5 blocks;
  config-1 scripts use 3; ``experiment_overfit/textenc_utils.py:80-100`` uses a GELU/1536
  variant — all are points of ``AdapterConfig``).
* Pooler MLP — deep CLS-pooler 768→3072→3072→768 whose output is added onto every token
  (``Training_sdfusion_bert_pooler.py:136-189``).
* ``BertAlign`` — zero-init 768×768 projection with a sigmoid gate
  (``token_utils.py:95-112``).
* ``TokenAlign77`` — adaptive average-pool of a length-L token sequence to 77 slots
  (``token_utils.py:83-92``).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from topomap_tpu.models.nn import KeyGen, Params, dense, dense_init, layer_norm, norm_init


@dataclasses.dataclass(frozen=True)
class AdapterConfig:
    dim: int = 768
    hidden: int = 768
    depth: int = 5            # number of (Linear→act→LN) blocks; config 3 uses 5, config 1 uses 3
    activation: str = "relu"  # "relu" | "gelu"
    # Per-block activation override (e.g. the overfit-lab variants mix GELU then ReLU:
    # ``textenc_utils.LastStateAdapter``/(-``_ctrlora``), ``textenc_utils.py:182-225``).
    activations: tuple[str, ...] | None = None

    @staticmethod
    def config3(dim: int = 768) -> "AdapterConfig":
        return AdapterConfig(dim=dim, hidden=dim, depth=5)

    @staticmethod
    def config1(dim: int = 768) -> "AdapterConfig":
        return AdapterConfig(dim=dim, hidden=dim, depth=3)

    @staticmethod
    def wide_gelu(dim: int = 768) -> "AdapterConfig":
        """``textenc_utils.LastStateAdapter`` (``:182-204``): 768→1536 GELU, 1536 ReLU."""
        return AdapterConfig(dim=dim, hidden=2 * dim, depth=2, activations=("gelu", "relu"))

    @staticmethod
    def ctrlora_adapter(dim: int = 768) -> "AdapterConfig":
        """``textenc_utils.LastStateAdapter_ctrlora`` (``:206-225``): GELU then ReLU at 768."""
        return AdapterConfig(dim=dim, hidden=dim, depth=2, activations=("gelu", "relu"))


def adapter_init(key, cfg: AdapterConfig = AdapterConfig()) -> Params:
    kg = KeyGen(key)
    blocks = []
    d = cfg.dim
    for _ in range(cfg.depth):
        blocks.append({"fc": dense_init(kg(), d, cfg.hidden), "ln": norm_init(cfg.hidden)})
        d = cfg.hidden
    return {"blocks": blocks, "out": dense_init(kg(), d, cfg.dim), "final_ln": norm_init(cfg.dim)}


def _act_fn(name: str):
    return jax.nn.relu if name == "relu" else (lambda v: jax.nn.gelu(v, approximate=False))


def adapter_apply(p: Params, cfg: AdapterConfig, x: jnp.ndarray) -> jnp.ndarray:
    for i, b in enumerate(p["blocks"]):
        name = cfg.activations[i] if cfg.activations else cfg.activation
        x = layer_norm(b["ln"], _act_fn(name)(dense(b["fc"], x)))
    return layer_norm(p["final_ln"], dense(p["out"], x))


# ---------------------------------------------------------------------------
# Pooler-MLP conditioning (Training_sdfusion_bert_pooler.py:136-189)
# ---------------------------------------------------------------------------


def pooler_mlp_init(key, dim: int = 768, hidden: int = 3072) -> Params:
    kg = KeyGen(key)
    return {
        "fc1": dense_init(kg(), dim, hidden),
        "fc2": dense_init(kg(), hidden, hidden),
        "fc3": dense_init(kg(), hidden, dim),
    }


def pooler_mlp_apply(p: Params, tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens [B,T,D]: deep-MLP the [CLS] (position 0) vector, add it onto every token."""
    cls = tokens[:, 0]
    h = jax.nn.tanh(dense(p["fc1"], cls))
    h = jax.nn.tanh(dense(p["fc2"], h))
    pooled = dense(p["fc3"], h)
    return tokens + pooled[:, None, :]


# ---------------------------------------------------------------------------
# BertAlign — gated zero-init projection (token_utils.py:95-112)
# ---------------------------------------------------------------------------


def bert_align_init(key, dim: int = 768, gate_init: float = 0.0) -> Params:
    return {
        "proj": {"w": jnp.zeros((dim, dim), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)},
        "gate": jnp.asarray(gate_init, jnp.float32),
    }


def bert_align_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """``x + sigmoid(gate) · proj(x)`` — identity at init (zero proj)."""
    return x + jax.nn.sigmoid(p["gate"]) * dense(p["proj"], x)


# ---------------------------------------------------------------------------
# TokenAlign77 — adaptive average pool over sequence length (token_utils.py:83-92)
# ---------------------------------------------------------------------------


def token_align(x: jnp.ndarray, target_len: int = 77) -> jnp.ndarray:
    """[B, L, D] → [B, target_len, D] via PyTorch-AdaptiveAvgPool1d bin semantics."""
    b, l, d = x.shape
    if l == target_len:
        return x
    starts = (jnp.arange(target_len) * l) // target_len
    ends = ((jnp.arange(target_len) + 1) * l + target_len - 1) // target_len
    idx = jnp.arange(l)
    # weight[t, i] = 1/(end-start) if start <= i < end
    in_bin = (idx[None, :] >= starts[:, None]) & (idx[None, :] < ends[:, None])
    w = in_bin.astype(x.dtype) / (ends - starts)[:, None].astype(x.dtype)
    return jnp.einsum("ti,bid->btd", w, x)
