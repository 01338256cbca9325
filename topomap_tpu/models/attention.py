"""Attention and transformer blocks for the SD UNet — functional, LoRA-aware, kernel-pluggable.

Capability mirror of the vendored LDM ``ldm.modules.attention`` stack the reference depends on
(``SpatialTransformer`` / ``CrossAttention`` / GEGLU ``FeedForward``; the reference wraps the
``to_q/to_k/to_v/to_out`` Linears in-place with LoRA at e.g.
``LoRA_modified/LoRA_utils.py:45-59``). Here the projections are explicit named leaves of the
parameter pytree and every projection accepts an optional LoRA subtree
``{"A": [d_in,r], "B": [r,d_out], "scale": ()}`` — injection is data, not monkey-patching.

The inner attention computation is pluggable: the default is a plain XLA einsum softmax
(which XLA fuses well at these shapes), and ``topomap_tpu.ops.flash_attention`` provides the
Pallas flash kernel used on TPU for the 4096-token self-attention.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from topomap_tpu.models.nn import (
    KeyGen,
    Params,
    dense,
    dense_init,
    group_norm,  # noqa: F401 — re-exported; fused variants used in the blocks below
    norm_init,
)

# attention_fn(q, k, v) with q/k/v [B, H, Tq|Tk, Dh] -> [B, H, Tq, Dh]
AttnFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def with_kv_downsample(attn_fn: AttnFn, factor: int, min_tokens: int = 1024) -> AttnFn:
    """Opt-in ToDo-style self-attention K/V token downsampling (arXiv:2402.13573).

    Returns a copy of ``attn_fn`` carrying ``kv_ds``/``kv_ds_min_tokens`` attributes that
    :func:`spatial_transformer` reads: at spatial levels with ≥ ``min_tokens`` tokens, the
    self-attention keys/values are computed from a ``factor×factor`` average-pooled copy of
    the hidden states while queries stay full-resolution — the output keeps its exact shape
    and no un-merge is needed (unlike ToMe's bipartite matching, which is gather-heavy and
    dynamic; pooling is static-shaped and XLA/Pallas-friendly). Cuts the dominant
    4096-token self-attention logits/PV cost by ``factor²``. Approximate — same opt-in
    contract as DeepCache/lazy-CFG (``DDIMConfig.deep_cache_interval``); cross-attention
    and low-res levels are untouched.
    """
    import functools

    wrapped = functools.wraps(attn_fn)(lambda q, k, v: attn_fn(q, k, v))
    wrapped.transposed = getattr(attn_fn, "transposed", False)
    wrapped.kv_ds = int(factor)
    wrapped.kv_ds_min_tokens = int(min_tokens)
    return wrapped


def _avgpool_tokens(t: jnp.ndarray, hh: int, ww: int, f: int) -> jnp.ndarray:
    """[B, hh*ww, C] → [B, (hh/f)*(ww/f), C] via f×f spatial mean (fp32 accumulate)."""
    b, _, c = t.shape
    pooled = t.reshape(b, hh // f, f, ww // f, f, c).astype(jnp.float32).mean(axis=(2, 4))
    return pooled.reshape(b, (hh // f) * (ww // f), c).astype(t.dtype)


def _lora_input(x: jnp.ndarray, lora: Params) -> jnp.ndarray:
    """Conditional CN-LoRA input modulation (``multiseg_multicolor_CNLoRA_pilot.py:277-327``):
    ``Δx = fc2(SiLU(fc1([mean_T(x) ; cond])))`` broadcast over tokens, else identity."""
    if "fuse" in lora and "cond" in lora:
        fuse = lora["fuse"]
        x_mean = x.mean(axis=1)
        cond = lora["cond"].astype(x.dtype)
        if cond.shape[0] != x.shape[0]:  # CFG 2B-batch: tile cond (batch-broadcast repair)
            reps = -(-x.shape[0] // cond.shape[0])
            cond = jnp.tile(cond, (reps, 1))[: x.shape[0]]
        fuse_in = jnp.concatenate([x_mean, cond], axis=-1)
        delta = jnp.dot(
            jax.nn.silu(jnp.dot(fuse_in, fuse["fc1"].astype(x.dtype))),
            fuse["fc2"].astype(x.dtype),
        )
        return x + delta[:, None, :]
    return x


def lora_dense(p: Params, x: jnp.ndarray, lora: Optional[Params] = None) -> jnp.ndarray:
    """``y = x W + b  [+ scale · ((x+Δx) A) B]`` — the LoRALinear law (``LoRA_utils.py:20-42``)."""
    y = dense(p, x)
    if lora is not None:
        xm = _lora_input(x, lora)
        delta = jnp.dot(jnp.dot(xm, lora["A"].astype(x.dtype)), lora["B"].astype(x.dtype))
        y = y + lora["scale"].astype(x.dtype) * delta
    return y


def _plain_lora(l) -> bool:
    """True for absent LoRA or a plain ``{A, B, scale}`` leaf (no control/fuse/post_add
    markers) — the forms the transpose-free projection path composes natively."""
    return l is None or not (set(l) - {"A", "B", "scale"})


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Default attention: einsum + fp32 softmax. Shapes [B,H,T,Dh]."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# ---------------------------------------------------------------------------
# CrossAttention (self-attention when context is None)
# ---------------------------------------------------------------------------


def cross_attention_init(
    kg: KeyGen, query_dim: int, context_dim: int | None, heads: int, dim_head: int
) -> Params:
    inner = heads * dim_head
    ctx = query_dim if context_dim is None else context_dim
    return {
        "to_q": {"w": dense_init(kg(), query_dim, inner)["w"]},  # LDM: no bias on q/k/v
        "to_k": {"w": dense_init(kg(), ctx, inner)["w"]},
        "to_v": {"w": dense_init(kg(), ctx, inner)["w"]},
        "to_out": dense_init(kg(), inner, query_dim),
    }


def _proj_nobias(
    p: Params, x: jnp.ndarray, lora: Optional[Params], lora_input: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if lora is not None:
        # post_add (diffusers LoRACrossAttnProcessor mode, models.py:72-152): the LoRA reads
        # the projection OUTPUT instead of the input.
        xm = y if "post_add" in lora else _lora_input(lora_input if lora_input is not None else x, lora)
        y = y + lora["scale"].astype(x.dtype) * jnp.dot(
            jnp.dot(xm, lora["A"].astype(x.dtype)), lora["B"].astype(x.dtype)
        )
    return y


def cross_attention(
    p: Params,
    x: jnp.ndarray,
    context: Optional[jnp.ndarray] = None,
    heads: int = 8,
    lora: Optional[Params] = None,
    attn_fn: AttnFn = xla_attention,
) -> jnp.ndarray:
    """x: [B, Tq, D]; context: [B, Tk, Dc] or None (self-attention).

    ControlLoRA composition (``topomap_tpu.lora.control_lora``): when the LoRA tree carries
    a ``control`` sub-dict with an injected ``state``, the control delta enters per the
    reference flavor — added to the Q-LoRA input (diffusers ``models.py:238-239``), to the
    hidden states pre-QKV + pre-out (V2 ``models.py:292-431``), or to the attention output
    (LDM-native ``attention_lora.py:74-81``, ``add_to_output`` marker).
    """
    ctx = x if context is None else context
    lora = lora or {}
    ctrl = lora.get("control")
    delta = None
    tc: Params = {}
    if ctrl is not None and "state" in ctrl:
        from topomap_tpu.lora.control_lora import control_delta

        delta = control_delta(ctrl, x)
        tc = ctrl.get("to_control", {})
        if "v2" in tc:
            x = x + delta  # V2: inject into hidden states before every projection
    q_lora_in = None
    if delta is not None and "v2" not in tc and "add_to_output" not in tc:
        q_lora_in = x + delta  # diffusers main mode: Q-LoRA reads hidden + control
    no_qkv_lora = not any(lora.get(n) for n in ("to_q", "to_k", "to_v"))
    # Transpose-free path: the attn_fn consumes/produces [B,H,Dh,T]; the projections emit
    # that layout straight from the MXU by contracting with output order [inner, T] — no
    # explicit transpose/copy remains. Plain {A, B, scale} LoRA leaves compose in the same
    # layout (the delta chain just ends with output order [r|inner, T]), so both merged
    # inference AND runtime-adapter training/eval ride this path; only the exotic modes
    # (control injection, CN-LoRA fuse/cond, post_add) fall back to the standard layout.
    if getattr(attn_fn, "transposed", False) and ctrl is None and all(
        _plain_lora(lora.get(n)) for n in ("to_q", "to_k", "to_v", "to_out")
    ):
        b, tq = x.shape[0], x.shape[1]

        def proj_t(w, lr, src):
            y = jnp.einsum("btc,ck->bkt", src, w.astype(src.dtype))
            if lr is not None:
                xa = jnp.einsum("btc,cr->brt", src, lr["A"].astype(src.dtype))
                y = y + lr["scale"].astype(src.dtype) * jnp.einsum(
                    "brt,rk->bkt", xa, lr["B"].astype(src.dtype)
                )
            return y

        if context is None and no_qkv_lora:
            wqkv = jnp.concatenate(
                [p["to_q"]["w"], p["to_k"]["w"], p["to_v"]["w"]], axis=1
            ).astype(x.dtype)
            q, k, v = jnp.split(jnp.einsum("btc,ck->bkt", x, wqkv), 3, axis=1)
        elif no_qkv_lora:
            q = jnp.einsum("btc,ck->bkt", x, p["to_q"]["w"].astype(x.dtype))
            wkv = jnp.concatenate([p["to_k"]["w"], p["to_v"]["w"]], axis=1).astype(ctx.dtype)
            k, v = jnp.split(jnp.einsum("btc,ck->bkt", ctx, wkv), 2, axis=1)
        else:
            q = proj_t(p["to_q"]["w"], lora.get("to_q"), x)
            k = proj_t(p["to_k"]["w"], lora.get("to_k"), ctx)
            v = proj_t(p["to_v"]["w"], lora.get("to_v"), ctx)
        inner = q.shape[1]
        dh = inner // heads
        split_t = lambda t_: t_.reshape(b, heads, dh, t_.shape[-1])
        out_t = attn_fn(split_t(q), split_t(k), split_t(v)).reshape(b, inner, tq)
        out = jnp.einsum(
            "bkt,kc->btc", out_t, p["to_out"]["w"].astype(x.dtype)
        ) + p["to_out"]["b"].astype(x.dtype)
        lo = lora.get("to_out")
        if lo is not None:
            oa = jnp.einsum("bkt,kr->brt", out_t, lo["A"].astype(x.dtype))
            out = out + lo["scale"].astype(x.dtype) * jnp.einsum(
                "brt,rc->btc", oa, lo["B"].astype(x.dtype)
            )
        return out
    if context is None and no_qkv_lora:
        # Fused self-attention QKV: one [C,3C] matmul instead of three (inference path —
        # LoRA deltas are merged into the weights before sampling). The concat is
        # loop-invariant, so XLA hoists it out of the DDIM scan.
        wqkv = jnp.concatenate(
            [p["to_q"]["w"], p["to_k"]["w"], p["to_v"]["w"]], axis=1
        ).astype(x.dtype)
        q, k, v = jnp.split(jnp.dot(x, wqkv), 3, axis=-1)
    elif no_qkv_lora:
        q = jnp.dot(x, p["to_q"]["w"].astype(x.dtype))
        wkv = jnp.concatenate([p["to_k"]["w"], p["to_v"]["w"]], axis=1).astype(ctx.dtype)
        k, v = jnp.split(jnp.dot(ctx, wkv), 2, axis=-1)
    else:
        q = _proj_nobias(p["to_q"], x, lora.get("to_q"), lora_input=q_lora_in)
        k = _proj_nobias(p["to_k"], ctx, lora.get("to_k"))
        v = _proj_nobias(p["to_v"], ctx, lora.get("to_v"))
    b, tq, inner = q.shape
    dh = inner // heads
    split = lambda t: t.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)
    if getattr(attn_fn, "transposed", False):
        # runtime-LoRA / control paths reach here with standard [B,H,T,Dh] tensors; a
        # transposed-layout kernel needs explicit layout flips around the call
        out = attn_fn(
            split(q).swapaxes(2, 3), split(k).swapaxes(2, 3), split(v).swapaxes(2, 3)
        ).swapaxes(2, 3)
    else:
        out = attn_fn(split(q), split(k), split(v))
    out = out.transpose(0, 2, 1, 3).reshape(b, tq, inner)
    out = lora_dense(p["to_out"], out, lora.get("to_out"))
    if delta is not None and "add_to_output" in tc:
        out = out + delta  # LDM-native v1
    if ctrl is not None and "state" in ctrl and "to_control_out" in ctrl:
        from topomap_tpu.lora.control_lora import control_delta

        out = out + control_delta(
            {"to_control": ctrl["to_control_out"], "state": ctrl["state"]}, x
        )
    return out


# ---------------------------------------------------------------------------
# GEGLU FeedForward
# ---------------------------------------------------------------------------


def feed_forward_init(kg: KeyGen, dim: int, mult: int = 4) -> Params:
    inner = dim * mult
    return {"proj_in": dense_init(kg(), dim, inner * 2), "proj_out": dense_init(kg(), inner, dim)}


def feed_forward(p: Params, x: jnp.ndarray, lora: Optional[Params] = None) -> jnp.ndarray:
    lora = lora or {}
    h = lora_dense(p["proj_in"], x, lora.get("proj_in"))
    h, gate = jnp.split(h, 2, axis=-1)
    # LDM GEGLU uses exact-erf gelu; under bf16 the tanh approximation's error (<3e-3
    # absolute) is below bf16 resolution while erf made the FF epilogue VPU-bound on TPU
    # (trace: the [B,4096,2560] gelu+proj_out fusion ran at 1/3 of HBM speed).
    approx = gate.dtype == jnp.bfloat16
    h = h * jax.nn.gelu(gate, approximate=approx)
    return lora_dense(p["proj_out"], h, lora.get("proj_out"))


# ---------------------------------------------------------------------------
# BasicTransformerBlock + SpatialTransformer
# ---------------------------------------------------------------------------


def transformer_block_init(
    kg: KeyGen, dim: int, context_dim: int, heads: int, dim_head: int
) -> Params:
    return {
        "norm1": norm_init(dim),
        "attn1": cross_attention_init(kg, dim, None, heads, dim_head),  # self
        "norm2": norm_init(dim),
        "attn2": cross_attention_init(kg, dim, context_dim, heads, dim_head),  # cross
        "norm3": norm_init(dim),
        "ff": feed_forward_init(kg, dim),
    }


def transformer_block(
    p: Params,
    x: jnp.ndarray,
    context: jnp.ndarray,
    heads: int,
    lora: Optional[Params] = None,
    attn_fn: AttnFn = xla_attention,
    *,
    self_kv_ds: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    zero_ctx_tail: int = 0,
) -> jnp.ndarray:
    from topomap_tpu.ops.fused_norm import layer_norm_fused

    lora = lora or {}
    xn = layer_norm_fused(p["norm1"], x)
    # ToDo K/V downsampling (see with_kv_downsample): queries full-res, keys/values pooled.
    x = x + cross_attention(
        p["attn1"], xn, None if self_kv_ds is None else self_kv_ds(xn),
        heads, lora.get("attn1"), attn_fn,
    )
    if context.shape[0] > x.shape[0]:
        # CFG shared-prefix fork: under parallel CFG the cond and uncond halves share
        # x_t, t and hint, so every op BEFORE the first cross-attention is identical for
        # both — the callers (pipeline.sample with DDIMConfig.cfg_fork) run the prefix at
        # batch B and the hidden states duplicate here, where the contexts first diverge.
        # Bit-exact: the tiled halves are equal up to this point by construction.
        # Only the intended fork shape (context = exactly 2x, the cond/uncond CFG pair)
        # is repaired; any other mismatch is a caller bug and must fail loudly (a bare
        # assert would be stripped under -O and silently produce a doubled batch).
        m, rem = divmod(context.shape[0], x.shape[0])
        if rem != 0 or m != 2:
            raise ValueError(
                f"context batch {context.shape[0]} incompatible with hidden batch "
                f"{x.shape[0]}: only the 2x CFG shared-prefix fork may duplicate x"
            )
        x = jnp.concatenate([x] * m, axis=0)
    a2l = lora.get("attn2")
    if zero_ctx_tail > 0 and (a2l is None or "control" not in a2l):
        # CFG zero-context shortcut: the trailing ``zero_ctx_tail`` batch items carry the
        # reference protocol's ZERO uncond embedding (``vis_metrics.py:425``). With
        # bias-free to_k/to_v (LDM CrossAttention), K = V = 0 there, so softmax is uniform
        # over zero values and the block output is EXACTLY the to_out bias — no Q/K/V
        # projection, kernel call, or out-projection needed for that half. The
        # substitution is bit-exact per op (plain Q/K/V/out LoRA deltas also vanish on
        # zero inputs); under jit the smaller graph can re-fuse neighbors, so compiled
        # outputs agree to ~ULP. Control-LoRA modes inject x-dependent deltas, so they
        # take the full path.
        bc = x.shape[0] - zero_ctx_tail
        bias = p["attn2"]["to_out"]["b"].astype(x.dtype)
        if bc == 0:  # whole batch is zero-context (lazy/sequential CFG uncond call)
            x = x + jnp.broadcast_to(bias, (x.shape[0], x.shape[1], bias.shape[-1]))
        else:
            a = cross_attention(
                p["attn2"], layer_norm_fused(p["norm2"], x[:bc]), context[:bc],
                heads, a2l, attn_fn,
            )
            tail = jnp.broadcast_to(bias, (zero_ctx_tail, x.shape[1], bias.shape[-1]))
            x = x + jnp.concatenate([a.astype(x.dtype), tail], axis=0)
    else:
        x = x + cross_attention(
            p["attn2"], layer_norm_fused(p["norm2"], x), context, heads, a2l, attn_fn
        )
    x = x + feed_forward(p["ff"], layer_norm_fused(p["norm3"], x), lora.get("ff"))
    return x


def spatial_transformer_init(
    kg: KeyGen, channels: int, context_dim: int, heads: int, depth: int = 1
) -> Params:
    dim_head = channels // heads
    return {
        "norm": norm_init(channels),
        "proj_in": dense_init(kg(), channels, channels),
        "blocks": [
            transformer_block_init(kg, channels, context_dim, heads, dim_head)
            for _ in range(depth)
        ],
        "proj_out": dense_init(kg(), channels, channels, zero=True),  # LDM zero-init
    }


def spatial_transformer(
    p: Params,
    x: jnp.ndarray,
    context: jnp.ndarray,
    heads: int,
    lora: Optional[Params] = None,
    attn_fn: AttnFn = xla_attention,
    zero_ctx_tail: int = 0,
) -> jnp.ndarray:
    """x: [B, H, W, C] NHWC; context: [B, Tk, Dc]. Residual like LDM SpatialTransformer."""
    from topomap_tpu.ops.fused_norm import group_norm_fused

    b, h, w, c = x.shape
    lora = lora or {}
    x_in = x
    y = group_norm_fused(p["norm"], x)
    y = y.reshape(b, h * w, c)
    y = dense(p["proj_in"], y)
    f = getattr(attn_fn, "kv_ds", 0)
    ds = None
    if f and f > 1 and h * w >= getattr(attn_fn, "kv_ds_min_tokens", 1024) \
            and h % f == 0 and w % f == 0:
        ds = lambda t: _avgpool_tokens(t, h, w, f)
    blocks_lora = lora.get("blocks", {})
    for i, bp in enumerate(p["blocks"]):
        y = transformer_block(
            bp, y, context, heads, _idx(blocks_lora, i), attn_fn, self_kv_ds=ds,
            zero_ctx_tail=zero_ctx_tail,
        )
    y = dense(p["proj_out"], y)
    if y.shape[0] > b:  # CFG shared-prefix fork happened inside: tile the residual too
        x_in = jnp.concatenate([x_in] * (y.shape[0] // b), axis=0)
    return y.reshape(y.shape[0], h, w, c) + x_in


def _idx(tree: Any, i: int):
    """Index helper tolerating missing LoRA subtrees (dict keyed by int, list, or None)."""
    if tree is None:
        return None
    if isinstance(tree, dict):
        return tree.get(i)
    try:
        return tree[i]
    except (IndexError, KeyError, TypeError):
        return None
