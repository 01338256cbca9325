"""Pallas 3x3 conv kernel (ops/conv3x3.py): interpret-mode parity + custom VJP vs XLA."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topomap_tpu.ops.conv3x3 import _conv3_fwd, conv3x3_same, use_pallas_conv3


def _xla(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b


@pytest.mark.parametrize("shape", [(2, 8, 8, 128, 128), (1, 16, 8, 256, 128)])
def test_conv3x3_forward_parity(shape):
    b, h, w, cin, cout = shape
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.float32)
    wk = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.float32)
    ref = _xla(x, wk, bias)
    out = _conv3_fwd(x, wk, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_conv3x3_vjp_matches_xla():
    b, h, w, cin, cout = 1, 8, 8, 128, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.float32)
    wk = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(3), (b, h, w, cout), jnp.float32)

    ref_grads = jax.vjp(_xla, x, wk, bias)[1](g)
    # exercise only the hand-written backward (the pallas forward needs a TPU; on-chip
    # fwd correctness is covered by tools/conv_kernel_bench.py + KERNELS artifacts)
    from topomap_tpu.ops.conv3x3 import _vjp_bwd

    got = _vjp_bwd((x, wk), g)
    for name, a, r in zip("xwb", got, ref_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-3, rtol=2e-3,
                                   err_msg=f"d{name}")


def test_dispatch_predicate():
    assert use_pallas_conv3((8, 32, 32, 640), (3, 3, 640, 640), 1, "SAME", backend="tpu")
    assert use_pallas_conv3((8, 16, 16, 1280), (3, 3, 1280, 1280), 1, "SAME", backend="tpu")
    assert not use_pallas_conv3((8, 64, 64, 320), (3, 3, 320, 320), 1, "SAME", backend="tpu")  # misaligned
    assert not use_pallas_conv3((8, 32, 32, 640), (3, 3, 640, 640), 2, "SAME", backend="tpu")  # stride
    assert not use_pallas_conv3((8, 32, 32, 640), (1, 1, 640, 640), 1, "SAME", backend="tpu")  # 1x1
    assert not use_pallas_conv3((8, 512, 512, 128), (3, 3, 128, 128), 1, "SAME", backend="tpu")  # VMEM
