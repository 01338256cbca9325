"""Winograd F(2×2, 3×3) convolution as a fused Pallas TPU kernel.

The round-2 roofline study (`tools/gemm_roofline.py`, BENCH_NOTES) showed XLA's direct
conv emitter already sits AT the practical im2col-GEMM roofline on this chip (a square
4096³ bf16 GEMM tops out at 93 TFLOP/s), so no direct-form kernel can win. Winograd
changes the FLOPs themselves: F(2×2,3×3) computes each 2×2 output tile from a 4×4 input
tile with 16 channel-contraction multiplies instead of 36 — **2.25× less MXU work** for
stride-1 SAME 3×3, the exact form of every UNet/ControlNet resblock conv (the dominant
60% of the sampling step, ``/root/reference/BaseModel/evaluateCN.py:93-101`` hot loop).

Done at the XLA level, Winograd loses: the 16-point transformed activations blow up HBM
traffic 4×. This kernel keeps everything in VMEM:

* the input is **phase-split** outside the kernel (one cheap XLA pass) into the 4
  (row-parity, col-parity) planes of the SAME-padded image, so all 16 Winograd taps
  d(u,v) become UNIT-offset slices ``phase[u%2,v%2][a+u//2, b+v//2]`` — no stride-2
  reads, no relayouts;
* the input transform Bᵀ·d·B runs as two-stage 2-term adds on the VPU (bf16),
* the 16 per-point channel GEMMs ``V_p[na·nb, CIN] @ U_p[CIN, CB]`` run on the MXU
  (K = CIN, lane-aligned by dispatch), accumulating straight into the four output-phase
  accumulators with the Aᵀ(·)A coefficients (all ±1),
* output phases are written separately and re-interleaved outside (one cheap XLA pass).

Weight transform U = G·w·Gᵀ is computed in XLA once per weight (hoisted out of the DDIM
scan; in training it is 16 tiny combinations per step). Backward = exact XLA conv math
via custom VJP. Numerics: Winograd is algebraically exact; in bf16 it costs ~1 ulp more
than the direct form (same class as any conv-algorithm change) — `TOPOMAP_CONV=xla`
restores the direct path, and tools/approx_quality.py-style PSNR checks apply.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# F(2x2, 3x3) transform matrices
_BT = np.array([[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)

_W_BLOCK_BUDGET = 7864320           # U block bytes (16·CIN·CB·2); fits 640->320 whole
_PLANE_BUDGET = 8 * 1024 * 1024     # 4 bf16 phase planes per batch item


def transform_weights(w: jnp.ndarray) -> jnp.ndarray:
    """w [3,3,CIN,COUT] → U [16, CIN, COUT] = G·w·Gᵀ per channel pair (fp32 math)."""
    g = jnp.asarray(_G)
    u = jnp.einsum("ai,ijcd,bj->abcd", g, w.astype(jnp.float32), g)
    return u.reshape(16, w.shape[2], w.shape[3])


def _pick_na(half_h: int) -> int:
    """Tile-row block: target ~8, must divide H/2."""
    best = 1
    for cand in range(1, half_h + 1):
        if half_h % cand == 0 and cand <= 8:
            best = cand
    return best


def _pick_cb(cin: int, cout: int) -> int:
    best = 0
    for cb in range(128, cout + 1, 128):
        if cout % cb == 0 and 16 * cin * cb * 2 <= _W_BLOCK_BUDGET:
            best = cb
    if best == 0 and 16 * cin * cout * 2 <= _W_BLOCK_BUDGET:
        best = cout  # non-128-multiple cout that still fits (e.g. 320)
    return best


def _wino_kernel(p00, p01, p10, p11, u_ref, b_ref, y00, y01, y10, y11, *, na: int, nb: int):
    """Grid (COUT/CB, B, (H/2)/na). Phase planes [1, H/2+1, W/2+1, CIN] (whole image per
    batch item); u_ref [16, CIN, CB]; y** [1, na, nb, CB]."""
    a0 = pl.program_id(2) * na
    cb = y00.shape[-1]
    dt = p00.dtype

    # phase blocks with +1 halo row/col
    blocks = []
    for ref in (p00, p01, p10, p11):
        blocks.append(ref[0, pl.dslice(a0, na + 1), pl.dslice(0, nb + 1), :])
    # d(u, v) = blocks[(u & 1) * 2 + (v & 1)][u >> 1 : +na, v >> 1 : +nb]

    def d(u, v):
        blk = blocks[(u & 1) * 2 + (v & 1)]
        return blk[(u >> 1):(u >> 1) + na, (v >> 1):(v >> 1) + nb, :]

    acc = [jnp.zeros((na, nb, cb), jnp.float32) for _ in range(4)]  # y00,y01,y10,y11
    for i in range(4):
        # vertical transform row i: T_v = sum_u BT[i,u] d(u, v)   (2 nonzero terms)
        t = []
        for v in range(4):
            terms = [(c, u) for u, c in enumerate(_BT[i]) if c != 0]
            s = None
            for c, u in terms:
                x = d(u, v)
                x = x if c > 0 else -x
                s = x if s is None else s + x
            t.append(s)
        for j in range(4):
            terms = [(c, v) for v, c in enumerate(_BT[j]) if c != 0]
            s = None
            for c, v in terms:
                x = t[v] if c > 0 else -t[v]
                s = x if s is None else s + x
            m = jax.lax.dot_general(
                s.astype(dt), u_ref[i * 4 + j],
                (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )  # [na, nb, cb]
            # scatter into output phases with AT[s,i]*AT[t,j] coefficients (0/±1)
            for si in range(2):
                ci = _AT[si, i]
                if ci == 0:
                    continue
                for tj in range(2):
                    cj = _AT[tj, j]
                    if cj == 0:
                        continue
                    c = ci * cj
                    acc[si * 2 + tj] = acc[si * 2 + tj] + (m if c > 0 else -m)

    bias = b_ref[0][None, None, :].astype(jnp.float32)
    for ref, a in zip((y00, y01, y10, y11), acc):
        ref[0, ...] = (a + bias).astype(ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _wino_fwd(x, w, b, interpret=False):
    bsz, h, wdim, cin = x.shape
    cout = w.shape[-1]
    hh, hw = h // 2, wdim // 2
    na = _pick_na(hh)
    nb = hw
    cb = _pick_cb(cin, cout) or cout

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # [B, h+2, w+2, C]
    # phase split: planes [B, hh+1, hw+1, C]; row r=2a+u ↔ phase u%2 index a+u//2
    ph = xp.reshape(bsz, hh + 1, 2, hw + 1, 2, cin)
    planes = [ph[:, :, u, :, v, :] for u in range(2) for v in range(2)]

    u_w = transform_weights(w).astype(x.dtype)
    kernel = functools.partial(_wino_kernel, na=na, nb=nb)
    phase_spec = pl.BlockSpec((1, hh + 1, hw + 1, cin), lambda k, i, j: (i, 0, 0, 0))
    out_spec = pl.BlockSpec((1, na, nb, cb), lambda k, i, j: (i, j, 0, k))
    outs = pl.pallas_call(
        kernel,
        grid=(cout // cb, bsz, hh // na),
        in_specs=[phase_spec] * 4 + [
            pl.BlockSpec((16, cin, cb), lambda k, i, j: (0, 0, k)),
            pl.BlockSpec((1, cb), lambda k, i, j: (0, k)),
        ],
        out_specs=[out_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((bsz, hh, hw, cout), x.dtype)] * 4,
        interpret=interpret,
    )(*planes, u_w, b.reshape(1, cout))
    # recombine: out[2a+s, 2b+t] = y_st[a, b]
    y = jnp.stack([jnp.stack(outs[0:2], axis=3), jnp.stack(outs[2:4], axis=3)], axis=2)
    # y [B, hh, 2(s), hw, 2(t), C]
    return y.reshape(bsz, h, wdim, cout)


@jax.custom_vjp
def wino_conv3x3(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3×3 stride-1 SAME conv via Winograd F(2×2,3×3). NHWC/HWIO, bias fused."""
    return _wino_fwd(x, w, b)


def _vjp_fwd(x, w, b):
    return _wino_fwd(x, w, b), (x, w)


def _vjp_bwd(res, g):
    x, w = res
    w_flip = w[::-1, ::-1].transpose(0, 1, 3, 2)
    dx = jax.lax.conv_general_dilated(
        g, w_flip, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ).astype(x.dtype)
    dw = jax.lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0),
        g.transpose(1, 2, 0, 3),
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).transpose(1, 2, 0, 3).astype(w.dtype)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(g.dtype)
    return dx, dw, db


wino_conv3x3.defvjp(_vjp_fwd, _vjp_bwd)


def use_winograd(shape: tuple, w_shape: tuple, stride: int, padding,
                 backend: str | None = None) -> bool:
    """Dispatch: stride-1 SAME 3×3, even H/W ≥ 16, channels ≥ 128 (small-channel convs
    like the 4-ch conv_in are faster direct), phase planes + U block inside VMEM."""
    if stride != 1 or padding != "SAME" or len(shape) != 4:
        return False
    if (backend or jax.default_backend()) != "tpu":
        return False  # compiled kernel is TPU-only; tests exercise interpret mode directly
    kh, kw, cin, cout = w_shape
    _, h, wdim, _ = shape
    if (kh, kw) != (3, 3) or h % 2 or wdim % 2 or h < 16 or wdim < 16:
        return False
    if cin < 128 or cout < 128:
        return False
    if _pick_cb(cin, cout) == 0:
        return False
    if 4 * (h // 2 + 1) * (wdim // 2 + 1) * cin * 2 > _PLANE_BUDGET:
        return False
    return True
