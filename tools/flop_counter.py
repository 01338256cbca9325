"""Backend-free analytic FLOP counter over a jaxpr.

``compiled.cost_analysis()["flops"]`` through the remote-TPU AOT service undercounted the
50-step sampling program ~15x vs an analytic estimate (it reported 18.3 TFLOP for a batch-4
CFG 50-step SD1.5+ControlNet scan), so MFU accounting cross-checks it with this counter:
trace the function (abstract eval only — no compile, no device), then walk the jaxpr
summing matmul/conv FLOPs with the standard 2·M·K·N / 2·K²·Cin·Cout·Hout·Wout·B
conventions, recursing into scan/while/cond/pjit with trip-count multipliers.

Counted: dot_general, conv_general_dilated. Everything else (elementwise, norms,
softmax, transposes) is bandwidth-bound on TPU and excluded on purpose — this is an
MXU-work counter, the right numerator for MFU against a GEMM ceiling.
"""
from __future__ import annotations

import math

import jax
import numpy as np


def _dot_flops(eqn) -> float:
    a, b = eqn.invars[0].aval, eqn.invars[1].aval
    ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
    batch = math.prod(a.shape[d] for d in lb)
    k = math.prod(a.shape[d] for d in lc)
    m = math.prod(a.shape[d] for d in range(a.ndim) if d not in set(lc) | set(lb))
    n = math.prod(b.shape[d] for d in range(b.ndim) if d not in set(rc) | set(rb))
    return 2.0 * batch * m * k * n


def _conv_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    fg = eqn.params.get("feature_group_count", 1)
    cin = rhs.shape[dn.rhs_spec[1]]  # per-group input channels
    kspatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    out_elems = math.prod(out.shape)  # includes batch, Cout, spatial
    return 2.0 * out_elems * cin * kspatial  # fg folds in: cin is already per-group


def count_jaxpr_flops(jaxpr, mult: float = 1.0) -> float:
    """Total matmul+conv FLOPs of a (closed) jaxpr, multiplying nested scan/while bodies
    by their trip counts (while loops need a known bound via `length`-style params and
    otherwise count as one iteration)."""
    total = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            total += _dot_flops(eqn) * mult
        elif prim == "conv_general_dilated":
            total += _conv_flops(eqn) * mult
        elif prim == "scan":
            total += count_jaxpr_flops(eqn.params["jaxpr"].jaxpr, mult * eqn.params["length"])
        elif prim == "while":
            total += count_jaxpr_flops(eqn.params["body_jaxpr"].jaxpr, mult)
            total += count_jaxpr_flops(eqn.params["cond_jaxpr"].jaxpr, mult)
        elif prim == "cond":
            # upper-bound with the most expensive branch (branches here are CFG on/off)
            total += max(count_jaxpr_flops(b.jaxpr, 1.0) for b in eqn.params["branches"]) * mult
        elif "jaxpr" in eqn.params:  # pjit / closed_call / remat / custom_vjp wrappers
            inner = eqn.params["jaxpr"]
            total += count_jaxpr_flops(getattr(inner, "jaxpr", inner), mult)
        elif "call_jaxpr" in eqn.params:
            inner = eqn.params["call_jaxpr"]
            total += count_jaxpr_flops(getattr(inner, "jaxpr", inner), mult)
    return total


def count_fn_flops(fn, *args, **kwargs) -> float:
    """Abstract-trace ``fn`` (no execution) and count its matmul/conv FLOPs."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return count_jaxpr_flops(closed.jaxpr)


if __name__ == "__main__":
    # self-check on known shapes
    import jax.numpy as jnp

    f = lambda a, b: a @ b
    got = count_fn_flops(f, jnp.zeros((128, 256)), jnp.zeros((256, 512)))
    assert got == 2 * 128 * 256 * 512, got

    def conv(x, w):
        return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    got = count_fn_flops(conv, jnp.zeros((2, 32, 32, 16)), jnp.zeros((3, 3, 16, 64)))
    assert got == 2 * (2 * 32 * 32 * 64) * 16 * 9, got

    def scanned(a, b):
        return jax.lax.scan(lambda c, _: (c @ b, None), a, None, length=10)[0]

    got = count_fn_flops(scanned, jnp.zeros((64, 64)), jnp.zeros((64, 64)))
    assert got == 10 * 2 * 64**3, got
    print("flop_counter self-checks OK")
