"""Is the 93 TFLOP/s square-GEMM "practical MXU ceiling" (tools/gemm_roofline.py) an
XLA artifact or the real runtime ceiling on this chip?

A hand-blocked Pallas matmul at 4096^3 bf16, swept over block shapes, vs jnp.dot.
If Pallas lands materially above 93 TFLOP/s, the im2col-GEMM conv roofline that closed
the conv battle (BENCH_NOTES.md) was an XLA-emitter limit and a Pallas im2col conv is
back on the table; if it lands at/below, the ceiling is the runtime/chip and the
conv-battle conclusion stands.

Timing per CLAUDE.md: in-scan, scalar-sum + device_get, 2 warmups (finalization).
Usage: python tools/pallas_gemm_probe.py          [REPS=20, SIZE=4096 via env]
Prints one JSON line to stdout; progress to stderr.
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

REPS = int(os.environ.get("REPS", "20"))
SIZE = int(os.environ.get("SIZE", "4096"))
INTERPRET = bool(int(os.environ.get("INTERPRET", "0")))


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def pallas_matmul(a, b, bm=512, bn=1024, bk=1024):
    m, k = a.shape
    _, n = b.shape
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        _mm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, l: (i, l)),
            pl.BlockSpec((bk, bn), lambda i, j, l: (l, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k, bytes_accessed=(m * k + k * n + m * n) * 2,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(a, b)


def time_scalar(fn, *args):
    f = jax.jit(fn)
    jax.device_get(f(*args))
    jax.device_get(f(*args))  # one-time executable finalization (CLAUDE.md)
    t0 = time.perf_counter()
    jax.device_get(f(*args))
    jax.device_get(f(*args))
    return (time.perf_counter() - t0) / 2


def bench(mm, m, k, n):
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16) * 0.02

    def run(a, b):
        def body(c, _):
            return mm(c, b), None

        return jnp.sum(jax.lax.scan(body, a, None, length=REPS)[0].astype(jnp.float32))

    dt = time_scalar(run, a, b)
    return 2.0 * m * k * n * REPS / dt / 1e12


def main():
    # correctness first (small, single block-grid)
    a = jax.random.normal(jax.random.PRNGKey(2), (1024, 1024), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(3), (1024, 1024), jnp.bfloat16)
    ref = jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    got = pallas_matmul(a, b, bm=256, bn=512, bk=512)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"parity: max abs err {err:.4f} (rel {rel:.2e})", file=sys.stderr, flush=True)
    assert rel < 2e-2, "pallas matmul parity failed"

    out = {"parity_rel_err": round(rel, 6)}
    s = SIZE
    tf = bench(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16), s, s, s)
    out["xla"] = round(tf, 1)
    print(f"xla dot {s}^3: {tf:.1f} TFLOP/s", file=sys.stderr, flush=True)

    for bm, bn, bk in ((512, 1024, 1024), (512, 512, 2048), (1024, 1024, 512),
                       (256, 1024, 2048), (512, 2048, 512)):
        try:
            tf = bench(lambda a, b: pallas_matmul(a, b, bm=bm, bn=bn, bk=bk), s, s, s)
        except Exception as e:  # noqa: BLE001 — record per-config compile failures
            print(f"pallas bm{bm} bn{bn} bk{bk}: FAILED {type(e).__name__}", file=sys.stderr)
            out[f"pallas_{bm}_{bn}_{bk}"] = None
            continue
        out[f"pallas_{bm}_{bn}_{bk}"] = round(tf, 1)
        print(f"pallas bm{bm} bn{bn} bk{bk}: {tf:.1f} TFLOP/s", file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
