"""Winograd F(2x2,3x3) conv kernel (ops/winograd_conv.py): interpret-mode parity,
weight-transform algebra, custom VJP vs XLA, dispatch gating."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topomap_tpu.ops.winograd_conv import (
    _vjp_bwd,
    _wino_fwd,
    transform_weights,
    use_winograd,
)


def _xla(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b


@pytest.mark.parametrize("shape", [(2, 8, 8, 128, 128), (1, 16, 8, 256, 128),
                                   (2, 8, 16, 128, 256)])
def test_winograd_forward_parity(shape):
    b, h, w, cin, cout = shape
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.float32)
    wk = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.float32)
    ref = _xla(x, wk, bias)
    out = _wino_fwd(x, wk, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_weight_transform_algebra():
    # Winograd identity on a single 4x4 tile: AT (G w G^T  .  BT d B) A == conv_valid(d, w)
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 1, 1), jnp.float32)
    u = transform_weights(w)  # [16, 1, 1]
    assert u.shape == (16, 1, 1)
    d = jax.random.normal(jax.random.PRNGKey(1), (4, 4), jnp.float32)
    bt = jnp.asarray(
        np.array([[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32))
    at = jnp.asarray(np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32))
    v = bt @ d @ bt.T
    m = u.reshape(4, 4) * v
    y = at @ m @ at.T  # [2, 2]
    ref = jax.lax.conv_general_dilated(
        d[None, :, :, None], w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_winograd_vjp_matches_xla():
    b, h, w, cin, cout = 1, 8, 8, 128, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.float32)
    wk = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(3), (b, h, w, cout), jnp.float32)

    ref_grads = jax.vjp(_xla, x, wk, bias)[1](g)
    got = _vjp_bwd((x, wk), g)
    for name, a, r in zip("xwb", got, ref_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-3, rtol=2e-3,
                                   err_msg=f"d{name}")


def test_dispatch_predicate():
    assert use_winograd((8, 64, 64, 320), (3, 3, 320, 320), 1, "SAME", backend="tpu")
    assert use_winograd((8, 32, 32, 640), (3, 3, 640, 640), 1, "SAME", backend="tpu")
    assert not use_winograd((8, 32, 32, 640), (3, 3, 640, 640), 2, "SAME", backend="tpu")   # stride
    assert not use_winograd((8, 32, 32, 640), (1, 1, 640, 640), 1, "SAME", backend="tpu")   # 1x1
    assert not use_winograd((8, 64, 64, 4), (3, 3, 4, 320), 1, "SAME", backend="tpu")       # tiny cin
    assert not use_winograd((8, 9, 9, 320), (3, 3, 320, 320), 1, "SAME", backend="tpu")     # odd H
    assert not use_winograd((8, 512, 512, 320), (3, 3, 320, 320), 1, "SAME", backend="tpu")  # VMEM
