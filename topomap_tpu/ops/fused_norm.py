"""Fused GroupNorm+SiLU Pallas kernel.

Trace profiling of the SD1.5 sampling step on v5e showed ~22% of device time in
normalization chains (``convert_reduce_fusion``/``multiply_reduce_fusion`` — fp32 statistic
passes over bf16 activations) because XLA lowers GroupNorm as several separate
reduce+broadcast fusions. This kernel does the whole thing in ONE pass over VMEM-resident
activations:

* per-channel Σx and Σx² via sublane reductions,
* group aggregation and the mean/inv-σ broadcast back to channels as two TINY matmuls
  against a constant 0/1 channel↔group matrix (MXU),
* normalize + affine + SiLU on the VPU, one write.

Used for the UNet/ControlNet resblock norms (HW ≤ 4096 at 512² tiles, so a whole sample's
activation block fits VMEM); larger spatial sizes (VAE at 512²) fall back to the jnp path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_MAX_HW = 4096
_MAX_VMEM_F32 = 10 * 1024 * 1024  # VMEM bytes budget for in+out blocks + temps


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(x_ref, m_ref, mt_ref, sb_ref, o_ref, *, n_per_group: float, eps: float, chunk: int,
            with_silu: bool = True):
    """Row-chunked so fp32 temporaries stay ~chunk×Cp (the bf16 in/out blocks dominate
    VMEM); statistics accumulate across chunks before the normalize pass."""
    hw = x_ref.shape[1]
    cp = x_ref.shape[2]
    m = m_ref[...]                    # [Cp, G]  (0/1, zero rows for padded channels)
    mt = mt_ref[...]                  # [G, Cp]
    n_chunks = hw // chunk

    s1 = jnp.zeros((1, cp), jnp.float32)
    s2 = jnp.zeros((1, cp), jnp.float32)
    for ci in range(n_chunks):
        xc = x_ref[0, ci * chunk : (ci + 1) * chunk, :].astype(jnp.float32)
        s1 = s1 + jnp.sum(xc, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(xc * xc, axis=0, keepdims=True)

    g1 = jnp.dot(s1, m, preferred_element_type=jnp.float32)  # [1, G]
    g2 = jnp.dot(s2, m, preferred_element_type=jnp.float32)
    mean = g1 / n_per_group
    var = g2 / n_per_group - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.dot(mean, mt, preferred_element_type=jnp.float32)  # [1, Cp]
    inv_c = jnp.dot(inv, mt, preferred_element_type=jnp.float32)
    scale = sb_ref[0:1]  # [1, Cp]
    bias = sb_ref[1:2]
    for ci in range(n_chunks):
        xc = x_ref[0, ci * chunk : (ci + 1) * chunk, :].astype(jnp.float32)
        y = (xc - mean_c) * inv_c * scale + bias
        if with_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, ci * chunk : (ci + 1) * chunk, :] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret", "with_silu"))
def _gn_silu_pallas(x, scale, bias, groups: int, eps: float, interpret: bool = False,
                    with_silu: bool = True):
    b, h, w, c = x.shape
    hw = h * w
    cp = _round_up(c, _LANE)
    g = groups
    cg = c // g

    m = np.zeros((cp, g), np.float32)
    for ch in range(c):
        m[ch, ch // cg] = 1.0
    m = jnp.asarray(m)
    mt = m.T
    sb = jnp.stack([
        jnp.pad(scale.astype(jnp.float32), (0, cp - c)),
        jnp.pad(bias.astype(jnp.float32), (0, cp - c)),
    ])

    xp = jnp.pad(x.reshape(b, hw, c), ((0, 0), (0, 0), (0, cp - c)))
    chunk = hw if hw <= 512 else 512
    out = pl.pallas_call(
        functools.partial(_kernel, n_per_group=float(hw * cg), eps=eps, chunk=chunk,
                          with_silu=with_silu),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, cp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, cp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, cp), x.dtype),
        interpret=interpret,
    )(xp, m, mt, sb)
    return out[:, :, :c].reshape(b, h, w, c)


def gn_silu_eligible(x, groups: int) -> bool:
    if x.ndim != 4:
        return False
    b, h, w, c = x.shape
    if c % min(groups, c):
        return False
    g = min(groups, c)
    while c % g:
        g -= 1
    hw = h * w
    if hw > 512 and hw % 512:
        return False
    # VMEM: in + out blocks at the actual dtype + fp32 chunk temporaries
    itemsize = x.dtype.itemsize if hasattr(x, "dtype") else 4
    block_bytes = hw * _round_up(c, _LANE) * itemsize * 2 + 512 * _round_up(c, _LANE) * 4 * 3
    return hw <= _MAX_HW and hw % 8 == 0 and c >= 8 and block_bytes <= _MAX_VMEM_F32


def _ref_gn_silu(scale, bias, x, groups: int, eps: float):
    from topomap_tpu.models.nn import group_norm, silu

    return silu(group_norm({"scale": scale, "bias": bias}, x, groups, eps))


def _ref_gn(scale, bias, x, groups: int, eps: float):
    from topomap_tpu.models.nn import group_norm

    return group_norm({"scale": scale, "bias": bias}, x, groups, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gn_plain_diff(scale, bias, x, groups: int, eps: float):
    return _gn_silu_pallas(x, scale, bias, groups=groups, eps=eps, with_silu=False)


def _gn_plain_fwd(scale, bias, x, groups, eps):
    return _gn_silu_pallas(x, scale, bias, groups=groups, eps=eps, with_silu=False), (scale, bias, x)


def _gn_plain_bwd(groups, eps, res, g):
    scale, bias, x = res
    _, vjp = jax.vjp(lambda s, b, xx: _ref_gn(s, b, xx, groups, eps), scale, bias, x)
    return vjp(g)


_gn_plain_diff.defvjp(_gn_plain_fwd, _gn_plain_bwd)


def group_norm_fused(p, x, groups: int = 32, eps: float = 1e-5, interpret: bool = False):
    """Fused plain GroupNorm (no activation) — one VMEM pass like :func:`group_norm_silu`.

    Used for the SpatialTransformer input norm, which LDM applies WITHOUT SiLU: the trace
    showed it as separate fp32 statistic reductions + layout copies (convert_reduce /
    reshape-to-groups) when left to XLA."""
    c = x.shape[-1]
    g = min(groups, c)
    while c % g:
        g -= 1
    if interpret:
        return _gn_silu_pallas(x, p["scale"], p["bias"], groups=g, eps=eps, interpret=True,
                               with_silu=False)
    if gn_silu_eligible(x, g) and jax.devices()[0].platform in ("tpu", "axon"):
        return _gn_plain_diff(p["scale"], p["bias"], x, g, eps)
    return _ref_gn(p["scale"], p["bias"], x, groups, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gn_silu_diff(scale, bias, x, groups: int, eps: float):
    return _gn_silu_pallas(x, scale, bias, groups=groups, eps=eps)


def _gn_silu_diff_fwd(scale, bias, x, groups, eps):
    return _gn_silu_pallas(x, scale, bias, groups=groups, eps=eps), (scale, bias, x)


def _gn_silu_diff_bwd(groups, eps, res, g):
    # Backward via the jnp reference (recompute) — pallas_call has no autodiff rule.
    scale, bias, x = res
    _, vjp = jax.vjp(lambda s, b, xx: _ref_gn_silu(s, b, xx, groups, eps), scale, bias, x)
    return vjp(g)


_gn_silu_diff.defvjp(_gn_silu_diff_fwd, _gn_silu_diff_bwd)


# ---------------------------------------------------------------------------
# Fused LayerNorm (one pass, per-row stats) — the transformer-block norms
# ---------------------------------------------------------------------------


def _ln_kernel(x_ref, sb_ref, o_ref, *, n: float, eps: float):
    """Per-row LayerNorm in one VMEM pass. x [1, chunk, Cp]; padded lanes are zero so they
    drop out of the sums; division uses the REAL feature count ``n``."""
    x = x_ref[0].astype(jnp.float32)                       # [chunk, Cp]
    s1 = jnp.sum(x, axis=1, keepdims=True)                 # [chunk, 1]
    s2 = jnp.sum(x * x, axis=1, keepdims=True)
    mean = s1 / n
    var = s2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv * sb_ref[0:1] + sb_ref[1:2]
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_pallas(x, scale, bias, eps: float, interpret: bool = False):
    b, t, c = x.shape
    cp = _round_up(c, _LANE)
    chunk = t if t <= 512 else 512
    tp = _round_up(t, chunk)
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, cp - c)))
    sb = jnp.stack([
        jnp.pad(scale.astype(jnp.float32), (0, cp - c)),
        jnp.pad(bias.astype(jnp.float32), (0, cp - c)),
    ])
    out = pl.pallas_call(
        functools.partial(_ln_kernel, n=float(c), eps=eps),
        grid=(b, tp // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, cp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, cp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, cp), x.dtype),
        interpret=interpret,
    )(xp, sb)
    return out[:, :t, :c]


def _ref_ln(scale, bias, x, eps: float):
    from topomap_tpu.models.nn import layer_norm

    return layer_norm({"scale": scale, "bias": bias}, x, eps=eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_diff(scale, bias, x, eps: float):
    return _ln_pallas(x, scale, bias, eps)


def _ln_diff_fwd(scale, bias, x, eps):
    return _ln_pallas(x, scale, bias, eps), (scale, bias, x)


def _ln_diff_bwd(eps, res, g):
    scale, bias, x = res
    _, vjp = jax.vjp(lambda s, b, xx: _ref_ln(s, b, xx, eps), scale, bias, x)
    return vjp(g)


_ln_diff.defvjp(_ln_diff_fwd, _ln_diff_bwd)


def ln_eligible(x) -> bool:
    if x.ndim != 3:
        return False
    b, t, c = x.shape
    if t > 512 and t % 512:
        return False
    itemsize = x.dtype.itemsize if hasattr(x, "dtype") else 4
    block_bytes = min(t, 512) * _round_up(c, _LANE) * (2 * itemsize + 4)
    return t % 8 == 0 and c >= 8 and block_bytes <= _MAX_VMEM_F32


def layer_norm_fused(p, x, eps: float = 1e-5, interpret: bool = False):
    """One-pass Pallas LayerNorm over the last dim of ``[B, T, C]`` — same semantics as
    ``models.nn.layer_norm``. XLA lowers LN as separate statistic+normalize fusions (two
    HBM passes over the activation); this keeps the block VMEM-resident. Differentiable via
    recompute-backward custom VJP; jnp fallback off-TPU or for ineligible shapes."""
    if interpret:
        return _ln_pallas(x, p["scale"], p["bias"], eps, interpret=True)
    if ln_eligible(x) and jax.devices()[0].platform in ("tpu", "axon"):
        return _ln_diff(p["scale"], p["bias"], x, eps)
    return _ref_ln(p["scale"], p["bias"], x, eps)


def group_norm_silu(p, x, groups: int = 32, eps: float = 1e-5, interpret: bool = False):
    """Fused ``silu(group_norm(x))`` — Pallas when eligible on TPU, jnp fallback otherwise.

    Same semantics as ``silu(models.nn.group_norm(p, x, groups))`` including the
    reduce-groups-until-divisible rule for small test channel counts. Differentiable
    (custom VJP recomputes the jnp reference backward).
    """
    c = x.shape[-1]
    g = min(groups, c)
    while c % g:
        g -= 1
    if interpret:
        return _gn_silu_pallas(x, p["scale"], p["bias"], groups=g, eps=eps, interpret=True)
    if gn_silu_eligible(x, g) and jax.devices()[0].platform in ("tpu", "axon"):
        return _gn_silu_diff(p["scale"], p["bias"], x, g, eps)
    return _ref_gn_silu(p["scale"], p["bias"], x, groups, eps)
