"""Functional LoRA: adapters are parameter *trees*, injection is tree construction.

The reference mutates modules in place (``LoRA_utils.LoRALinear`` wrapping ``to_q/to_k/to_v``
Linears, ``LoRA_utils.py:20-59``; K/V-only ``textenc_utils.py:162-169``; Q/K/V/O
``Training_sdfusion_bert_lora_qkvo.py:246``; FFN ``multiseg_add_ffn.py:325-328``; conditional
CN-LoRA ``multiseg_multicolor_CNLoRA_pilot.py:206-365``). Here the same capability is a pure
function: ``build_lora_tree(params, spec, key)`` walks a model parameter tree and returns a
*mirror tree* holding ``{"A", "B", "scale"}`` leaves exactly where the model's apply functions
(``topomap_tpu.models.attention``) look for them. Training configs 1/2/3 differ only in which
trees exist and which leaves the optimizer marks trainable.

Math (identical to the reference): ``y = x·W + b + scale · (x·A)·B`` with
``scale = (alpha or 2r)/r`` (default 2.0), A ~ kaiming-uniform(a=√5) (i.e. U(±1/√d_in)),
B = 0 — so injection is exactly identity at init.

For inference the tree can be **merged**: ``W_eff = W + scale·A·B`` (``merge_lora``), which
is what the Pallas fused-attention path consumes — zero extra matmuls at sample time.

Conditional CN-LoRA: a leaf may additionally carry ``{"fuse": {fc1, fc2}}`` params; at call
time ``attach_condition`` injects the runtime feature vector, and the projection computes
``Δx = fc2(SiLU(fc1([x_mean ; cond])))``, ``y = x·W + scale·((x+Δx)·A)·B``.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from topomap_tpu.models.nn import rand_uniform

Params = dict[str, Any]

_ATTN_KEYS = {"to_q", "to_k", "to_v", "to_out"}
_FF_KEYS = {"proj_in", "proj_out"}


@dataclasses.dataclass(frozen=True)
class LoRASpec:
    """Which projections get LoRA and at what rank. ``None`` = no adapter."""

    r_q: Optional[int] = None
    r_k: Optional[int] = None
    r_v: Optional[int] = None
    r_out: Optional[int] = None
    r_ff: Optional[int] = None
    alpha: Optional[float] = None  # scale = (alpha or 2r)/r
    attn1: bool = True  # self-attention
    attn2: bool = True  # cross-attention
    conditional: bool = False  # CN-LoRA fuse-MLP modulation
    cond_dim: int = 0  # dim of [seg_feat ; text_feat] for the fuse MLP

    # --- presets mirroring the reference selectors ---
    @staticmethod
    def qkv(r_q: int = 4, r_kv: int = 12) -> "LoRASpec":
        """``lora_qkv`` — asymmetric Q small / K,V large (``LoRA_utils.py:45-59``)."""
        return LoRASpec(r_q=r_q, r_k=r_kv, r_v=r_kv)

    @staticmethod
    def kv(r: int = 16) -> "LoRASpec":
        """``lora_kv`` (``textenc_utils.py:162-169``)."""
        return LoRASpec(r_k=r, r_v=r)

    @staticmethod
    def qkvo(r: int = 8) -> "LoRASpec":
        """``lora_attn_qkvo`` (``Training_sdfusion_bert_lora_qkvo.py:246``)."""
        return LoRASpec(r_q=r, r_k=r, r_v=r, r_out=r)

    @staticmethod
    def qkv_ffn(r: int = 8, r_ff: int = 4) -> "LoRASpec":
        """qkv + FeedForward LoRA (``multiseg_add_ffn.py:325-328``)."""
        return LoRASpec(r_q=r, r_k=r, r_v=r, r_ff=r_ff)

    @staticmethod
    def ctrlora(rank: int = 12) -> "LoRASpec":
        """ctrlora ControlNet LoRA, rank 12 or 32 (the finetune YAMLs of
        ``addlrSD.py:281`` / ``onlyCNLora.py:210``)."""
        return LoRASpec(r_q=rank, r_k=rank, r_v=rank, r_out=rank)

    @staticmethod
    def cn_lora(r: int = 16, cond_dim: int = 0) -> "LoRASpec":
        """Conditional CN-LoRA (``multiseg_multicolor_CNLoRA_pilot.py:330-345``: qkv, r=16)."""
        return LoRASpec(r_q=r, r_k=r, r_v=r, conditional=True, cond_dim=cond_dim)


def _kaiming_a5(key, d_in: int, r: int) -> jnp.ndarray:
    """torch kaiming_uniform_(a=√5) on a [r, d_in] weight ⇒ U(±1/√d_in); stored as [d_in, r]."""
    bound = 1.0 / math.sqrt(d_in)
    return rand_uniform(key, (d_in, r), -bound, bound)


def _leaf(key, d_in: int, d_out: int, r: int, spec: LoRASpec) -> Params:
    scale = (spec.alpha if spec.alpha is not None else 2.0 * r) / r
    k1, k2, k3 = jax.random.split(key, 3)
    leaf: Params = {
        "A": _kaiming_a5(k1, d_in, r),
        "B": jnp.zeros((r, d_out), jnp.float32),
        "scale": jnp.asarray(scale, jnp.float32),
    }
    if spec.conditional:
        fuse_in = d_in + spec.cond_dim
        hidden = max(256, d_in // 2)
        bound1 = 1.0 / math.sqrt(fuse_in)
        bound2 = 1.0 / math.sqrt(hidden)
        leaf["fuse"] = {
            "fc1": rand_uniform(k2, (fuse_in, hidden), -bound1, bound1),
            "fc2": rand_uniform(k3, (hidden, d_in), -bound2, bound2),
        }
    return leaf


def _attn_lora(key, attn_params: Params, spec: LoRASpec) -> Params:
    out: Params = {}
    plan = [("to_q", spec.r_q), ("to_k", spec.r_k), ("to_v", spec.r_v), ("to_out", spec.r_out)]
    keys = jax.random.split(key, len(plan))
    for k, (name, r) in zip(keys, plan):
        if r is None or name not in attn_params:
            continue
        w = attn_params[name]["w"]
        out[name] = _leaf(k, w.shape[0], w.shape[1], r, spec)
    return out


def _ff_lora(key, ff_params: Params, spec: LoRASpec) -> Params:
    out: Params = {}
    keys = jax.random.split(key, 2)
    for k, name in zip(keys, ("proj_in", "proj_out")):
        w = ff_params[name]["w"]
        out[name] = _leaf(k, w.shape[0], w.shape[1], spec.r_ff, spec)
    return out


def build_lora_tree(params: Params, spec: LoRASpec, key) -> Params:
    """Walk a UNet/ControlNet parameter tree; return the mirror LoRA tree.

    Mirrors the reference's ``for m in unet.modules(): if hasattr(m, "to_q")...`` walk
    (``LoRA_utils.py:49-59``): every attention block found anywhere in the tree gets
    adapters per ``spec``; ``attn1``/``attn2`` flags restrict to self/cross attention;
    ``r_ff`` adds FeedForward adapters.
    """
    counter = [0]

    def next_key():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    def walk(node, name: str):
        if isinstance(node, dict):
            if _ATTN_KEYS <= set(node.keys()):
                if (name == "attn1" and not spec.attn1) or (name == "attn2" and not spec.attn2):
                    return None
                sub = _attn_lora(next_key(), node, spec)
                return sub or None
            if name == "ff" and _FF_KEYS <= set(node.keys()):
                if spec.r_ff is None:
                    return None
                return _ff_lora(next_key(), node, spec)
            out = {}
            for k, v in node.items():
                r = walk(v, k)
                if r is not None:
                    out[k] = r
            return out or None
        if isinstance(node, (list, tuple)):
            out = {}
            for i, v in enumerate(node):
                r = walk(v, str(i))
                if r is not None:
                    out[i] = r
            return out or None
        return None

    return walk(params, "") or {}


def merge_lora(params: Params, lora: Optional[Params]) -> Params:
    """Fold every LoRA leaf into its base weight: ``W_eff = W + scale·A·B``.

    Inference-time fusion — the resulting tree runs through the unchanged model code (and
    the Pallas kernels) with zero per-layer adapter cost. Conditional leaves (with a
    ``fuse`` MLP) cannot be merged and raise.
    """
    if not lora:
        return params

    def walk(p, l):
        if l is None:
            return p
        if isinstance(p, dict):
            out = dict(p)
            for k, v in p.items():
                lk = l.get(k) if isinstance(l, dict) else None
                if isinstance(lk, dict) and "A" in lk and "B" in lk:
                    if "fuse" in lk:
                        raise ValueError("conditional CN-LoRA leaves cannot be merged")
                    delta = lk["scale"] * (lk["A"] @ lk["B"])
                    out[k] = dict(v, w=v["w"] + delta.astype(v["w"].dtype))
                else:
                    out[k] = walk(v, lk)
            return out
        if isinstance(p, (list, tuple)):
            if isinstance(l, dict):
                return [walk(v, l.get(i)) for i, v in enumerate(p)]
            return [walk(v, None) for v in p]
        return p

    return walk(params, lora)


def count_lora_params(lora: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(lora))


def lora_param_paths(lora: Params) -> list[str]:
    """Flat '/'-joined paths of every A/B leaf — used by checkpoint filtering (the reference
    saves UNet-LoRA subsets by ``".A."``/``".B."`` key substring, ``addlrSD.py:533-543``)."""
    paths = []

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}")
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}/{i}")
        else:
            paths.append(prefix.lstrip("/"))

    walk(lora, "")
    return paths


def attach_condition(lora: Params, cond_feat: jnp.ndarray) -> Params:
    """Inject the runtime condition vector ``[B, cond_dim]`` (pooled seg_feat ⊕ mean text
    tokens — ``set_lora_condition`` / ``vis_metrics.py:368-372``) into every conditional
    leaf so the projections can compute their fuse-MLP deltas."""

    def walk(node):
        if isinstance(node, dict):
            if "fuse" in node and "A" in node:
                return dict(node, cond=cond_feat)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [walk(v) for v in node]
        return node

    return walk(lora)
