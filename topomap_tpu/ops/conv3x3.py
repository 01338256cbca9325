"""Pallas 3×3 stride-1 SAME convolution for the UNet hot shapes.

The exact-path trace (BENCH_NOTES) shows convolutions are ~50% of the warm sampling step
at ~32% effective MXU. XLA's conv lowering achieves 60–66 TFLOP/s on every UNet level —
including the 640- and 1280-channel levels where the channel count is lane-aligned
(640 = 5·128, 1280 = 10·128) and the padding-ceiling argument does not apply. This kernel
computes the conv as 9 accumulated MXU GEMMs over a VMEM-resident spatially-padded image:
tap (dy,dx) contributes ``x[:, y+dy, x+dx, :] @ w[dy,dx]`` — direct shifted-window reads,
no im2col copies, fp32 accumulator, bias fused.

Reference hot loop this accelerates: ``/root/reference/BaseModel/evaluateCN.py:93-101``
(50-step DDIM over the SD1.5+ControlNet UNet, all of whose res blocks are 3×3 convs).

Grid ``(COUT/CB, B, H/ROWS)``: the output-channel block is OUTERMOST so each weight block
(up to ~6 MB for the 1280-channel levels — the full 9·1280·1280 tensor is 29 MB and cannot
be VMEM-resident) is fetched once and stays resident while the batch/row cells sweep;
row-block output cells pipeline the write-back. Only stride-1 SAME 3×3 NHWC convs with
lane-aligned channels and VMEM-fitting images dispatch here (``use_pallas_conv3``);
everything else stays on XLA. Backward = XLA conv math via custom VJP (pallas_call has no
autodiff).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# per-block VMEM budgets (bytes): weight block + image + accumulator must co-reside
_W_BLOCK_BUDGET = 7 * 1024 * 1024
_IMG_BUDGET = 8 * 1024 * 1024


def _pick_rows(h: int, w: int) -> int:
    """Output row-block height: target M = rows*w ≈ 768 MXU rows, dividing H evenly."""
    target = max(1, 768 // w)
    rows = 1
    for cand in range(1, h + 1):
        if h % cand == 0 and cand <= target:
            rows = cand
    return rows


def _pick_cout_block(cin: int, cout: int) -> int:
    """Largest multiple-of-128 divisor of COUT whose 9·CIN·CB weight block fits VMEM."""
    best = 0
    for cb in range(128, cout + 1, 128):
        if cout % cb == 0 and 9 * cin * cb * 2 <= _W_BLOCK_BUDGET:
            best = cb
    return best


def _conv3_kernel(x_ref, w_ref, b_ref, o_ref, *, rows: int, wdim: int):
    """x_ref [1, H+2, W+2, CIN]; w_ref [9, CIN, CB]; b_ref [1, CB];
    o_ref [1, rows, W, CB]. Grid (COUT/CB, B, H/rows)."""
    r = pl.program_id(2) * rows
    cb = o_ref.shape[-1]
    acc = jnp.zeros((rows, wdim, cb), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, pl.dslice(r + dy, rows), pl.dslice(dx, wdim), :]
            acc += jax.lax.dot_general(
                xs,
                w_ref[dy * 3 + dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc += b_ref[0][None, None, :].astype(jnp.float32)
    o_ref[0, ...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3_fwd(x, w, b, interpret=False):
    bsz, h, wdim, cin = x.shape
    cout = w.shape[-1]
    rows = _pick_rows(h, wdim)
    cb = _pick_cout_block(cin, cout)
    if cb == 0:  # no viable split (only when dispatched incorrectly)
        cb = cout
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9, cin, cout)
    kernel = functools.partial(_conv3_kernel, rows=rows, wdim=wdim)
    out = pl.pallas_call(
        kernel,
        grid=(cout // cb, bsz, h // rows),
        in_specs=[
            pl.BlockSpec((1, h + 2, wdim + 2, cin), lambda k, i, j: (i, 0, 0, 0)),
            pl.BlockSpec((9, cin, cb), lambda k, i, j: (0, 0, k)),
            pl.BlockSpec((1, cb), lambda k, i, j: (0, k)),
        ],
        out_specs=pl.BlockSpec((1, rows, wdim, cb), lambda k, i, j: (i, j, 0, k)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wdim, cout), x.dtype),
        interpret=interpret,
    )(xp, wf, b.reshape(1, cout))
    return out


@jax.custom_vjp
def conv3x3_same(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3×3 stride-1 SAME conv, NHWC/HWIO, bias fused. Pallas forward, XLA backward."""
    return _conv3_fwd(x, w, b)


def _vjp_fwd(x, w, b):
    return _conv3_fwd(x, w, b), (x, w)


def _vjp_bwd(res, g):
    x, w = res
    # dx: full correlation with spatially-flipped, io-transposed weights
    w_flip = w[::-1, ::-1].transpose(0, 1, 3, 2)
    dx = jax.lax.conv_general_dilated(
        g, w_flip, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ).astype(x.dtype)
    # dw: correlate x with g (batch/spatial as contraction)
    dw = jax.lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0),  # CIN as batch
        g.transpose(1, 2, 0, 3),  # HWIO with batch as I
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).transpose(1, 2, 0, 3).astype(w.dtype)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(g.dtype)
    return dx, dw, db


conv3x3_same.defvjp(_vjp_fwd, _vjp_bwd)


def use_pallas_conv3(shape: tuple, w_shape: tuple, stride: int, padding,
                     backend: str | None = None) -> bool:
    """Dispatch predicate: stride-1 SAME 3×3, lane-aligned channels (the 320-ch level pads
    320→384 on both GEMM operands — XLA and this kernel share the same 0.69 ceiling there,
    so it is not worth the custom path yet), image resident in VMEM, splittable COUT."""
    if stride != 1 or padding != "SAME" or len(shape) != 4:
        return False
    if (backend or jax.default_backend()) != "tpu":
        return False  # compiled kernel is TPU-only; tests exercise interpret mode directly
    kh, kw, cin, cout = w_shape
    _, h, wdim, _ = shape
    if (kh, kw) != (3, 3):
        return False
    if cin % 128 or cout % 128:
        return False
    if h < 8 or wdim < 8 or h % _pick_rows(h, wdim):
        return False
    if _pick_cout_block(cin, cout) == 0:
        return False
    if (h + 2) * (wdim + 2) * cin * 2 > _IMG_BUDGET:
        return False
    return True
