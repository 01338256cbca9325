"""Minimal functional NN primitives: params are plain pytrees, modules are (init, apply) pairs.

Design rationale (TPU-first): every model in this framework is a pure function of an explicit
parameter pytree. That makes LoRA a *tree transformation* (extra leaves merged into projection
weights, see ``topomap_tpu.lora``), makes pjit sharding a matter of annotating the tree, and
keeps everything trivially ``jax.jit``/``lax.scan``-compatible — no module system, no tracing
magic, no framework state. Layout is NHWC (images) / [B, T, D] (sequences); convolution kernels
are HWIO, dense kernels [in, out]; compute dtype is a call-site argument (bfloat16 on TPU),
parameters stay float32.
"""
from __future__ import annotations

import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers
#
# Initial weight VALUES are host-generated with numpy Philox keyed from the jax PRNG key:
# deterministic, and ~20× faster than eager threefry for the ~1.2B-parameter SD1.5 bundle
# (threefry on CPU took minutes; Philox takes seconds). Under jit tracing (where key data
# is abstract) the same helpers fall back to jax.random.
# ---------------------------------------------------------------------------


def np_rng(key) -> np.random.Generator:
    if isinstance(key, np.ndarray):  # fast host key from KeyGen
        kd = key.astype(np.uint64)
    else:
        kd = np.asarray(jax.random.key_data(key)).ravel().astype(np.uint64)
    return np.random.Generator(np.random.Philox(key=kd[:2]))


def _is_concrete(key) -> bool:
    return isinstance(key, np.ndarray) or not isinstance(key, jax.core.Tracer)


def rand_normal(key, shape, std: float = 1.0, dtype=jnp.float32):
    if _is_concrete(key):
        return jnp.asarray(np_rng(key).standard_normal(shape, dtype=np.float32) * std, dtype)
    return jax.random.normal(key, shape, dtype) * std


def rand_uniform(key, shape, lo: float, hi: float, dtype=jnp.float32):
    if _is_concrete(key):
        return jnp.asarray(
            np_rng(key).random(shape, dtype=np.float32) * (hi - lo) + lo, dtype
        )
    return jax.random.uniform(key, shape, dtype, lo, hi)


def _fan_in_scale(key, shape, fan_in, scale=1.0, dtype=jnp.float32):
    """LDM's default init is kaiming-uniform-ish; variance-scaled normal works identically
    for training-from-scratch and is checkpoint-overwritten for pretrained use."""
    std = scale / math.sqrt(max(fan_in, 1))
    return rand_normal(key, shape, std, dtype)


def dense_init(key, d_in: int, d_out: int, scale: float = 1.0, zero: bool = False) -> Params:
    if zero:
        w = jnp.zeros((d_in, d_out), jnp.float32)
    else:
        w = _fan_in_scale(key, (d_in, d_out), d_in, scale)
    return {"w": w, "b": jnp.zeros((d_out,), jnp.float32)}


def dense(p: Params, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    dtype = dtype or x.dtype
    return jnp.dot(x.astype(dtype), p["w"].astype(dtype)) + p["b"].astype(dtype)


def conv_init(key, c_in: int, c_out: int, k: int = 3, zero: bool = False) -> Params:
    if zero:
        w = jnp.zeros((k, k, c_in, c_out), jnp.float32)
    else:
        w = _fan_in_scale(key, (k, k, c_in, c_out), k * k * c_in)
    return {"w": w, "b": jnp.zeros((c_out,), jnp.float32)}


def conv(p: Params, x: jnp.ndarray, stride: int = 1, padding: str | int = "SAME", dtype=None):
    dtype = dtype or x.dtype
    mode = os.environ.get("TOPOMAP_CONV")
    if (
        mode == "taps"
        and stride == 1
        and padding == "SAME"
        and p["w"].shape[0] == 3
        and p["w"].shape[1] == 3
    ):
        return _conv3x3_taps(p, x, dtype)
    if mode == "wino":
        from topomap_tpu.ops.winograd_conv import use_winograd, wino_conv3x3

        if use_winograd(x.shape, p["w"].shape, stride, padding):
            return wino_conv3x3(
                x.astype(dtype), p["w"].astype(dtype), p["b"].astype(dtype)
            )
    if mode == "pallas":
        # Evidence-backed negative result kept dispatchable (see BENCH_NOTES conv battle):
        # the Pallas cout-block kernel wins only the 64x64 decoder-concat shape (+8%);
        # XLA holds the rest, so this stays opt-in like TOPOMAP_CONV=wino.
        from topomap_tpu.ops.conv3x3 import conv3x3_same, use_pallas_conv3

        if use_pallas_conv3(x.shape, p["w"].shape, stride, padding):
            return conv3x3_same(
                x.astype(dtype), p["w"].astype(dtype), p["b"].astype(dtype)
            )
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        p["w"].astype(dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(dtype)


def _conv3x3_taps(p: Params, x: jnp.ndarray, dtype):
    """3×3 SAME conv as the sum of 9 shifted [BHW,C]×[C,O] matmuls (``TOPOMAP_CONV=taps``).

    Experimental alternative lowering: each tap is a plain GEMM the MXU tiles directly,
    sidestepping the conv emitter's window handling. Numerics identical up to summation
    order."""
    w = p["w"].astype(dtype)
    x = x.astype(dtype)
    h, wd = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = None
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(
                xp, (0, dy, dx, 0), (x.shape[0], h, wd, x.shape[3])
            )
            t = jnp.einsum("bhwc,co->bhwo", xs, w[dy, dx],
                           preferred_element_type=dtype)
            y = t if y is None else y + t
    return y + p["b"].astype(dtype)


def norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def group_norm(p: Params, x: jnp.ndarray, groups: int = 32, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over the channel (last) axis of NHWC / [B,T,D]. fp32 statistics."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    c = x.shape[-1]
    g = min(groups, c)
    while c % g:
        g -= 1
    shape = x.shape[:-1] + (g, c // g)
    xg = x.reshape(shape)
    red = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = xg.mean(axis=red, keepdims=True)
    var = xg.var(axis=red, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(x.shape)
    return (x * p["scale"] + p["bias"]).astype(orig_dtype)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return (x * p["scale"] + p["bias"]).astype(orig_dtype)


def silu(x):
    return jax.nn.silu(x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# Timestep embedding (LDM sinusoidal)
# ---------------------------------------------------------------------------


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [B] int32 → [B, dim] float32 (cos | sin halves)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


# ---------------------------------------------------------------------------
# Key splitting helper
# ---------------------------------------------------------------------------


class KeyGen:
    """Sequential PRNG key dispenser for init functions.

    For concrete keys the sequence is derived HOST-SIDE (base key data + counter feeding
    numpy Philox) — ~2000 ``jax.random.split`` dispatches otherwise dominate large-model
    init time. Under tracing it falls back to real splits.
    """

    def __init__(self, key):
        if isinstance(key, np.ndarray) or not isinstance(key, jax.core.Tracer):
            kd = (
                key.astype(np.uint64)
                if isinstance(key, np.ndarray)
                else np.asarray(jax.random.key_data(key)).ravel().astype(np.uint64)
            )
            base = int(kd[0]) << 32 | int(kd[-1]) & 0xFFFFFFFF
            self._base = np.uint64(base)
            self._counter = 0
            self._key = None
        else:
            self._key = key

    def __call__(self):
        if self._key is not None:
            self._key, sub = jax.random.split(self._key)
            return sub
        self._counter += 1
        return np.asarray([self._base, self._counter], np.uint64)
