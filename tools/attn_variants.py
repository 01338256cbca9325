"""Attention kernel softmax-cost shoot-out on the SD hot shapes.

Hypothesis: at head_dim 40 the tt kernel is VPU-bound on softmax — per (bh, q-block) the
MXU work is ~3.6 us but the [T_k, blk] logits block takes 3-4 full VPU passes (max-reduce,
subtract+exp, sum-reduce). Variants:

  v0_max    — round-1 production kernel (frozen copy): exact max-subtracted softmax,
              VPU sum-reduce denominator.
  v1_clamp  — replace the max pass with a clamp at +60 (exp<=1.1e26, x4096 keys ~4.7e29,
              well inside fp32); removes one full read+reduce of the logits block.
  v2_bf16   — v1 + exponentials computed in bf16 (2x VPU packing), sum still fp32.
  v3_prod   — the CURRENT production kernel via the real wrapper: clamp form + scale·log2e
              folded into q + exp2 + denominator as an MXU ones-row of vT.

Parity is checked against jax.nn.softmax attention; v1/v2 are exact when logits stay
in (-inf, 60) — SD's scaled logits sit in ~[-30, 30].

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/attn_variants.py check
    python tools/attn_variants.py bench     [REPS=100 via env]
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from topomap_tpu.ops.flash_attention import flash_attention_tt, _round_up, _LANE


def _kernel_v0_max(qt_ref, kt_ref, vt_ref, ot_ref, *, scale: float):
    """Round-1 production kernel (frozen here for A/B): scale on the logits block,
    max-subtracted exp, VPU sum-reduce denominator."""
    qt = qt_ref[0].astype(jnp.float32)
    kt = kt_ref[0].astype(jnp.float32)
    vt = vt_ref[0]
    logits_t = jax.lax.dot_general(
        kt, qt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(logits_t, axis=0, keepdims=True)
    p = jnp.exp(logits_t - m).astype(vt.dtype)
    denom = jnp.sum(p.astype(jnp.float32), axis=0, keepdims=True)
    ot = jax.lax.dot_general(
        vt, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    ot_ref[0] = (ot / denom).astype(ot_ref.dtype)

# (B, H, Dh, Tq, Tk): SD1.5 self-attention levels at batch 8 (CFG-effective 4x2)
SHAPES = [
    (8, 8, 40, 4096, 4096),
    (8, 8, 80, 1024, 1024),
    (8, 8, 40, 4096, 128),   # cross-attn (77->128 padded) at the 64^2 level
]


def _kernel_clamp(qt_ref, kt_ref, vt_ref, ot_ref, *, scale: float, exp_bf16: bool):
    qt = qt_ref[0].astype(jnp.float32)
    kt = kt_ref[0].astype(jnp.float32)
    vt = vt_ref[0]
    logits_t = jax.lax.dot_general(
        kt, qt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    logits_t = jnp.minimum(logits_t, 60.0)
    if exp_bf16:
        p = jnp.exp(logits_t.astype(jnp.bfloat16))
    else:
        p = jnp.exp(logits_t).astype(vt.dtype)
    denom = jnp.sum(p.astype(jnp.float32), axis=0, keepdims=True)
    ot = jax.lax.dot_general(
        vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    ot_ref[0] = (ot / denom).astype(ot_ref.dtype)


def run_tt(qt, kt, vt, kernel, block_q=512, interpret=False):
    b, h, d, tq = qt.shape
    tk = kt.shape[3]
    scale = d**-0.5
    need_mask = (tk % _LANE) != 0
    d_pad = _round_up(d + (1 if need_mask else 0), 8)
    tk_pad = _round_up(tk, _LANE)
    blk_q = min(block_q, _round_up(tq, _LANE))
    tq_pad = _round_up(tq, blk_q)
    qp = jnp.pad(qt.reshape(b * h, d, tq), ((0, 0), (0, d_pad - d), (0, tq_pad - tq)))
    kp = jnp.pad(kt.reshape(b * h, d, tk), ((0, 0), (0, d_pad - d), (0, tk_pad - tk)))
    vp = jnp.pad(vt.reshape(b * h, d, tk), ((0, 0), (0, d_pad - d), (0, tk_pad - tk)))
    if need_mask:
        qp = qp.at[:, d, :tq].set(1.0)
        kp = kp.at[:, d, tk:].set(-1e9 / scale)
    grid = (b * h, tq_pad // blk_q)
    out = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d_pad, blk_q), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad, tk_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad, tk_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_pad, blk_q), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, d_pad, tq_pad), qt.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :d, :tq].reshape(b, h, d, tq)


VARIANTS = {
    "v0_max": (_kernel_v0_max, 512),
    "v1_clamp": (functools.partial(_kernel_clamp, exp_bf16=False), 512),
    "v2_bf16": (functools.partial(_kernel_clamp, exp_bf16=True), 512),
    "v1_blk1024": (functools.partial(_kernel_clamp, exp_bf16=False), 1024),
    "v1_blk2048": (functools.partial(_kernel_clamp, exp_bf16=False), 2048),
    "v0_blk2048": (_kernel_v0_max, 2048),
    "v0_blk4096": (_kernel_v0_max, 4096),
    # v3 = shipped kernel (folded scale·log2e into q, exp2, MXU ones-row denominator);
    # benchmarked through the production wrapper, which picks its own block size.
    "v3_prod": ("PROD", 0),
}


def make_qkv(b, h, d, tq, tk, dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    qt = jax.random.normal(ks[0], (b, h, d, tq), dtype)
    kt = jax.random.normal(ks[1], (b, h, d, tk), dtype)
    vt = jax.random.normal(ks[2], (b, h, d, tk), dtype)
    return qt, kt, vt


def ref_attn(qt, kt, vt):
    d = qt.shape[2]
    logits = jnp.einsum("bhdq,bhdk->bhqk", qt.astype(jnp.float32),
                        kt.astype(jnp.float32)) * d**-0.5
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhdk->bhdq", probs, vt.astype(jnp.float32))


def check():
    import numpy as np

    for (b, h, d, tq, tk) in [(1, 2, 40, 512, 512), (1, 2, 40, 512, 77)]:
        qt, kt, vt = make_qkv(b, h, d, tq, tk, jnp.float32)
        ref = ref_attn(qt, kt, vt)
        for name, (kern, _blk) in VARIANTS.items():
            if kern == "PROD":
                out = flash_attention_tt(qt, kt, vt, interpret=True)
            else:
                out = run_tt(qt, kt, vt, kern, interpret=True)
            err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
            tol = 3e-2 if name == "v2_bf16" else 2e-4
            assert err < tol, (name, tq, tk, err)
            print(f"ok {name} T{tq}/{tk} err {err:.2e}", file=sys.stderr)
    print(json.dumps({"check": "ok"}))


def bench():
    reps = int(os.environ.get("REPS", "100"))
    table = {}
    for (b, h, d, tq, tk) in SHAPES:
        key = f"h{h}d{d}q{tq}k{tk}"
        table[key] = {}
        done = os.environ.get("DONE", "").split(",")
        for name, (kern, blk) in VARIANTS.items():
            if f"{key}:{name}" in done:
                continue
            # scoped-vmem guard: fp32 logits block must stay under ~16MB
            tkp = _round_up(tk, _LANE)
            if kern != "PROD" and tkp * min(blk, tq) * 4 > 16 * 1024 * 1024:
                continue
            qt, kt, vt = make_qkv(b, h, d, tq, tk)

            @jax.jit
            def run(qt, kt, vt):
                def body(c, _):
                    if kern == "PROD":
                        o = flash_attention_tt(c, kt, vt)
                    else:
                        o = run_tt(c, kt, vt, kern, block_q=blk)
                    return o.astype(jnp.bfloat16), None

                return jnp.sum(jax.lax.scan(body, qt, None, length=reps)[0].astype(jnp.float32))

            jax.device_get(run(qt, kt, vt))
            jax.device_get(run(qt, kt, vt))
            t0 = time.perf_counter()
            jax.device_get(run(qt, kt, vt))
            jax.device_get(run(qt, kt, vt))
            dt = (time.perf_counter() - t0) / 2
            tf = 2 * 2 * b * h * tq * tk * d * reps / dt / 1e12
            us = dt / reps * 1e6
            table[key][name] = {"tflops": round(tf, 1), "us": round(us, 1)}
            print(f"{key} {name}: {tf:.1f} TFLOP/s ({us:.0f} us)", file=sys.stderr, flush=True)
    print(json.dumps(table))


if __name__ == "__main__":
    (check if (len(sys.argv) > 1 and sys.argv[1] == "check") else bench)()
