"""On-device numeric validation of the Pallas kernels against the jnp references.

CPU tests exercise the kernels in interpreter mode; this script runs the COMPILED kernels
on the real TPU at production shapes and asserts they match the XLA reference math. Run
after any kernel change, before benchmarking.

``--json PATH`` additionally writes a one-object JSON artifact (device, per-check max
abs error vs atol, overall ok) — committed per round as ``KERNELS_r{N}.json`` so the
real-chip correctness of the production kernels is a recorded fact, not a claim.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

RESULTS: list[dict] = []


def check(name, got, ref, atol):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    err = float(np.abs(got - ref).max())
    ok = err <= atol
    print(f"{'OK ' if ok else 'FAIL'} {name:48s} max|Δ|={err:.3e} (atol {atol})")
    RESULTS.append({"name": name, "max_abs_err": err, "atol": atol, "ok": ok})
    return ok


def main():
    from topomap_tpu.models.attention import xla_attention
    from topomap_tpu.models.nn import group_norm, layer_norm
    from topomap_tpu.ops.flash_attention import (
        flash_attention_t,
        flash_attention_tt,
        flash_attention_t_bwd,
    )
    from topomap_tpu.ops.fused_norm import group_norm_fused, group_norm_silu, layer_norm_fused

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=sys.stderr)
    rng = jax.random.PRNGKey(0)
    oks = []

    # attention — production shapes (self 4096/dh40, cross 77 keys), bf16
    for tq, tk, d, h in [(4096, 4096, 40, 8), (4096, 77, 40, 8), (1024, 1024, 80, 8), (1024, 77, 80, 8)]:
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (2, h, tq, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (2, h, tk, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (2, h, tk, d), jnp.bfloat16)
        ref = jax.jit(xla_attention)(q, k, v)
        out = jax.jit(flash_attention_t)(q, k, v)
        oks.append(check(f"flash_t  T={tq}/{tk} d={d}", out, ref, 2e-2))
        tt = lambda x: x.transpose(0, 1, 3, 2)
        out2 = jax.jit(flash_attention_tt)(tt(q), tt(k), tt(v))
        oks.append(check(f"flash_tt T={tq}/{tk} d={d}", tt(out2), ref, 2e-2))

    # attention backward at a training shape
    q = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 1024, 80), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 1024, 80), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 1024, 80), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(6), q.shape, jnp.float32)
    ref_grads = jax.vjp(xla_attention, q, k, v)[1](g)
    got_grads = jax.jit(flash_attention_t_bwd)(q, k, v, g)
    for nm, a, b in zip("qkv", got_grads, ref_grads):
        oks.append(check(f"flash_t_bwd d{nm}", a, b, 5e-3))

    # fused norms at production shapes
    for shape, groups in [((8, 64, 64, 320), 32), ((8, 32, 32, 640), 32), ((8, 16, 16, 1280), 32)]:
        x = jax.random.normal(jax.random.PRNGKey(7), shape, jnp.bfloat16) * 2 + 0.3
        p = {"scale": jax.random.normal(jax.random.PRNGKey(8), shape[-1:]) + 1.0,
             "bias": jax.random.normal(jax.random.PRNGKey(9), shape[-1:])}
        # atol: one bf16 ulp at |y|≈8 (scale·normalized can reach ~±12) = 0.0625; the
        # kernel's fp32 sum-then-square stats round differently from jnp's two-pass var.
        ref = jax.nn.silu(group_norm(p, x, groups))
        oks.append(check(f"gn_silu {shape}", jax.jit(lambda: group_norm_silu(p, x, groups))(), ref, 9e-2))
        refp = group_norm(p, x, groups)
        oks.append(check(f"gn_plain {shape}", jax.jit(lambda: group_norm_fused(p, x, groups))(), refp, 9e-2))

    for shape in [(8, 4096, 320), (8, 1024, 640), (8, 256, 1280), (16, 77, 768)]:
        x = jax.random.normal(jax.random.PRNGKey(10), shape, jnp.bfloat16) * 2 + 0.3
        p = {"scale": jax.random.normal(jax.random.PRNGKey(11), shape[-1:]) + 1.0,
             "bias": jax.random.normal(jax.random.PRNGKey(12), shape[-1:])}
        ref = layer_norm(p, x)
        oks.append(check(f"layer_norm {shape}", jax.jit(lambda: layer_norm_fused(p, x))(), ref, 9e-2))

    json_path = None
    if "--json" in sys.argv:
        json_path = sys.argv[sys.argv.index("--json") + 1]
    if json_path:
        artifact = {
            "device": f"{dev} ({dev.platform})",
            "ok": bool(all(oks)),
            "checks": RESULTS,
        }
        with open(json_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {json_path}", file=sys.stderr)
    if not all(oks):
        sys.exit(1)
    print("all kernel checks passed")


if __name__ == "__main__":
    main()
