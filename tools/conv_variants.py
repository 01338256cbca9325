"""Conv kernel variant shoot-out (chip experiment; winners get promoted to ops/conv3x3.py).

Variants, all on the cout-block outer grid of ops/conv3x3.py:
  taps   — current production kernel: 9 shifted dslice reads, 9 accumulated GEMMs.
  band   — dy-outer loop reads one full-width row band, dx slices come from the band
           (isolates the dy vs dx misaligned-read cost).
  im2col — build [rows*W, 9*CIN] in VMEM (stack on axis 2, no transpose), ONE deep GEMM
           (K = 9*CIN, lane-aligned) — tests whether per-tap GEMM setup/relayout is the
           gap vs XLA.

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/conv_variants.py check
    python tools/conv_variants.py bench      [REPS=50 BATCH=8 via env]
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

from topomap_tpu.ops.conv3x3 import _conv3_fwd, _pick_cout_block, _pick_rows

SHAPES = [
    (64, 64, 640, 320),
    (32, 32, 640, 640),
    (32, 32, 1280, 640),
    (16, 16, 1280, 1280),
]


def _kernel_band(x_ref, w_ref, b_ref, o_ref, *, rows, wdim):
    r = pl.program_id(2) * rows
    cb = o_ref.shape[-1]
    acc = jnp.zeros((rows, wdim, cb), jnp.float32)
    for dy in range(3):
        band = x_ref[0, pl.dslice(r + dy, rows), :, :]  # [rows, W+2, CIN]
        for dx in range(3):
            acc += jax.lax.dot_general(
                band[:, dx:dx + wdim, :], w_ref[dy * 3 + dx],
                (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc += b_ref[0][None, None, :].astype(jnp.float32)
    o_ref[0, ...] = acc.astype(o_ref.dtype)


def _kernel_im2col(x_ref, w_ref, b_ref, o_ref, *, rows, wdim):
    r = pl.program_id(2) * rows
    cb = o_ref.shape[-1]
    cin = x_ref.shape[-1]
    taps = []
    for dy in range(3):
        band = x_ref[0, pl.dslice(r + dy, rows), :, :]
        for dx in range(3):
            taps.append(band[:, dx:dx + wdim, :])
    col = jnp.stack(taps, axis=2).reshape(rows * wdim, 9 * cin)
    acc = jax.lax.dot_general(
        col, w_ref[...].reshape(9 * cin, cb),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc = acc.reshape(rows, wdim, cb) + b_ref[0][None, None, :].astype(jnp.float32)
    o_ref[0, ...] = acc.astype(o_ref.dtype)


KERNELS = {"band": _kernel_band, "im2col": _kernel_im2col}


@functools.partial(jax.jit, static_argnames=("variant", "interpret"))
def conv_variant(x, w, b, variant, interpret=False):
    bsz, h, wdim, cin = x.shape
    cout = w.shape[-1]
    rows = _pick_rows(h, wdim)
    cb = _pick_cout_block(cin, cout) or cout
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9, cin, cout)
    kernel = functools.partial(KERNELS[variant], rows=rows, wdim=wdim)
    return pl.pallas_call(
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


def check():
    import numpy as np

    for (h, wd, cin, cout) in SHAPES[:2]:
        x = jax.random.normal(jax.random.PRNGKey(0), (2, h, wd, cin), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.float32) * 0.02
        b = jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        for name in KERNELS:
            out = conv_variant(x, w, b, name, interpret=True)
            err = float(jnp.abs(out - ref).max())
            assert err < 2e-2, (name, h, cin, cout, err)
            print(f"ok {name} {h}x{wd}x{cin}->{cout} err {err:.2e}", file=sys.stderr)
    print(json.dumps({"check": "ok"}))


def bench():
    batch = int(os.environ.get("BATCH", "8"))
    reps = int(os.environ.get("REPS", "50"))
    table = {}
    for (h, wd, cin, cout) in SHAPES:
        key = f"{h}x{wd}x{cin}->{cout}"
        table[key] = {}
        fns = {"taps": lambda a, ww, bb: _conv3_fwd(a, ww, bb)}
        for nm in KERNELS:
            fns[nm] = functools.partial(conv_variant, variant=nm)
        for name, fn in fns.items():
            w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.bfloat16) * 0.02
            b = jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.bfloat16)

            @jax.jit
            def run(x0, w, b):
                def body(c, _):
                    y = fn(c, w, b)
                    if cin != cout:
                        y = jnp.tile(y, (1, 1, 1, cin // cout))
                    return y.astype(jnp.bfloat16), None

                return jnp.sum(jax.lax.scan(body, x0, None, length=reps)[0].astype(jnp.float32))

            xs = [jax.random.normal(jax.random.PRNGKey(10 + i), (batch, h, wd, cin), jnp.bfloat16)
                  for i in range(4)]
            jax.device_get(run(xs[0], w, b))
            jax.device_get(run(xs[1], w, b))
            t0 = time.perf_counter()
            jax.device_get(run(xs[2], w, b))
            jax.device_get(run(xs[3], w, b))
            dt = (time.perf_counter() - t0) / 2
            tf = 2.0 * batch * h * wd * cin * cout * 9 * reps / dt / 1e12
            table[key][name] = round(tf, 1)
            print(f"{key} {name}: {tf:.1f} TFLOP/s", file=sys.stderr, flush=True)
    print(json.dumps(table))


if __name__ == "__main__":
    (check if (len(sys.argv) > 1 and sys.argv[1] == "check") else bench)()
