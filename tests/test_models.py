import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topomap_tpu.models.controlnet import controlnet_apply, controlnet_init
from topomap_tpu.models.unet import UNetConfig, unet_apply, unet_init
from topomap_tpu.models.vae import VAEConfig, vae_decode, vae_encode, vae_init, vae_sample_latent


CFG = UNetConfig.tiny()


@pytest.fixture(scope="module")
def unet_params():
    return unet_init(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def ctrl_params():
    return controlnet_init(jax.random.PRNGKey(1), CFG)


def test_unet_shapes_and_zero_init_out(unet_params):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4))
    t = jnp.array([3, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 77, CFG.context_dim))
    eps = unet_apply(unet_params, CFG, x, t, ctx)
    assert eps.shape == x.shape
    assert np.all(np.isfinite(np.asarray(eps)))
    # out_conv is zero-init → untrained output must be exactly zero (LDM zero_module).
    np.testing.assert_array_equal(np.asarray(eps), 0.0)


def _unzero(params, seed=9, scale=0.02):
    """Replace every all-zero leaf (LDM zero_module inits) with small random values so the
    full trunk — time-emb adds, transformer proj_outs, final conv — contributes to the output."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    new = [
        jax.random.normal(k, l.shape, l.dtype) * scale if float(jnp.abs(l).sum()) == 0 else l
        for k, l in zip(keys, leaves)
    ]
    return jax.tree.unflatten(treedef, new)


def test_unet_timestep_sensitivity_after_perturbing_out(unet_params):
    p = _unzero(unet_params)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, CFG.context_dim))
    e1 = unet_apply(p, CFG, x, jnp.array([1]), ctx)
    e2 = unet_apply(p, CFG, x, jnp.array([900]), ctx)
    assert not np.allclose(np.asarray(e1), np.asarray(e2))
    # Context sensitivity through cross-attention:
    ctx2 = jax.random.normal(jax.random.PRNGKey(5), ctx.shape)
    e3 = unet_apply(p, CFG, x, jnp.array([1]), ctx2)
    assert not np.allclose(np.asarray(e1), np.asarray(e3))


def test_controlnet_residual_count_and_zero_init(ctrl_params):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    ctx = jnp.zeros((1, 7, CFG.context_dim))
    control = controlnet_apply(ctrl_params, CFG, x, hint, jnp.array([10]), ctx)
    # len(channel_mult)=2, num_res_blocks=1: blocks = conv_in + (res, down, res) → 4 skips + middle.
    assert len(control) == 5
    for c in control:
        np.testing.assert_array_equal(np.asarray(c), 0.0)  # zero convs


def test_controlnet_plus_unet_integration(unet_params, ctrl_params):
    # Un-zero the zero-convs to confirm residuals propagate into the UNet output.
    cp = jax.tree.map(lambda x: x, ctrl_params)
    cp["zero_convs"] = [
        jax.tree.map(lambda x: jnp.ones_like(x) * 0.01, zc) for zc in cp["zero_convs"]
    ]
    cp["middle_block_out"] = jax.tree.map(
        lambda x: jnp.ones_like(x) * 0.01, cp["middle_block_out"]
    )
    up = jax.tree.map(lambda x: x, unet_params)
    up["out_conv"] = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(9), x.shape) * 0.02, up["out_conv"]
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    ctx = jnp.zeros((1, 7, CFG.context_dim))
    control = controlnet_apply(cp, CFG, x, hint, jnp.array([10]), ctx)
    e_ctrl = unet_apply(up, CFG, x, jnp.array([10]), ctx, control=control)
    e_none = unet_apply(up, CFG, x, jnp.array([10]), ctx)
    assert not np.allclose(np.asarray(e_ctrl), np.asarray(e_none))


def test_control_scales_scale_residuals(ctrl_params):
    cp = jax.tree.map(lambda x: x, ctrl_params)
    cp["zero_convs"] = [
        jax.tree.map(lambda x: jnp.ones_like(x) * 0.01, zc) for zc in cp["zero_convs"]
    ]
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    ctx = jnp.zeros((1, 7, CFG.context_dim))
    scales = jnp.full((5,), 0.5)
    c1 = controlnet_apply(cp, CFG, x, hint, jnp.array([10]), ctx)
    c2 = controlnet_apply(cp, CFG, x, hint, jnp.array([10]), ctx, control_scales=scales)
    np.testing.assert_allclose(np.asarray(c2[0]), 0.5 * np.asarray(c1[0]), rtol=1e-5)


def test_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    p = vae_init(jax.random.PRNGKey(0), cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3), minval=-1, maxval=1)
    mean, logvar = vae_encode(p, cfg, img)
    assert mean.shape == (2, 16, 16, 4)  # /2 downscale for tiny (2 levels)
    z = vae_sample_latent(jax.random.PRNGKey(2), mean, logvar, cfg.scale_factor)
    out = vae_decode(p, cfg, z)
    assert out.shape == img.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_vae_encode_deterministic_mean():
    cfg = VAEConfig.tiny()
    p = vae_init(jax.random.PRNGKey(0), cfg)
    img = jnp.ones((1, 16, 16, 3)) * 0.3
    m1, _ = vae_encode(p, cfg, img)
    m2, _ = vae_encode(p, cfg, img)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_unet_bf16_compute_close_to_f32(unet_params):
    p = jax.tree.map(lambda x: x, unet_params)
    p["out_conv"] = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(9), x.shape) * 0.02, p["out_conv"]
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 7, CFG.context_dim))
    e32 = unet_apply(p, CFG, x, jnp.array([100]), ctx, compute_dtype=jnp.float32)
    e16 = unet_apply(p, CFG, x, jnp.array([100]), ctx, compute_dtype=jnp.bfloat16)
    assert e16.dtype == jnp.float32  # output promoted back
    np.testing.assert_allclose(np.asarray(e32), np.asarray(e16), atol=0.05)


def test_unet_grads_flow(unet_params):
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 7, CFG.context_dim))
    noise = jax.random.normal(jax.random.PRNGKey(4), x.shape)
    params = _unzero(unet_params)

    def loss(p):
        eps = unet_apply(p, CFG, x, jnp.array([100]), ctx)
        return jnp.mean((eps - noise) ** 2)

    g = jax.grad(loss)(params)
    # out_conv grads nonzero; deep encoder conv grads nonzero too (chain intact).
    assert float(jnp.abs(g["out_conv"]["w"]).sum()) > 0
    assert float(jnp.abs(g["encoder"]["blocks"][0]["conv_in"]["w"]).sum()) > 0


def test_conv_taps_lowering_matches_lax(monkeypatch):
    """TOPOMAP_CONV=taps (3x3 conv as 9 shifted GEMMs) is numerically equivalent."""
    import numpy as np

    from topomap_tpu.models.nn import KeyGen, conv, conv_init

    kg = KeyGen(jax.random.PRNGKey(0))
    p = conv_init(kg(), 5, 7, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 11, 5))
    ref = conv(p, x)
    monkeypatch.setenv("TOPOMAP_CONV", "taps")
    out = conv(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # strided / non-3x3 convs fall through to the lax path untouched
    p1 = conv_init(kg(), 5, 6, 1)
    np.testing.assert_allclose(
        np.asarray(conv(p1, x, stride=2)).shape, (2, 5, 6, 6)
    )
