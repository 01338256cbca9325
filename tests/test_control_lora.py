"""ControlLoRA (diffusers-style + LDM-native) functional tests."""
import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.lora.control_lora import (
    ControlLoRAEncoderConfig,
    build_control_lora_tree,
    build_ldm_control_lora_tree,
    control_encoder_apply,
    control_encoder_init,
    encoder_block_ds,
    decoder_block_ds,
    inject_control_states,
    mini_control_encoder_apply,
    mini_control_encoder_init,
)
from topomap_tpu.models.unet import UNetConfig, unet_apply, unet_init
from tests.util import unzero

CFG = UNetConfig.tiny()  # channel_mult (1,2), attention at ds 1,2


def _params():
    return unzero(unet_init(jax.random.PRNGKey(0), CFG))


def test_encoder_stage_shapes_and_widths():
    ecfg = ControlLoRAEncoderConfig(stage_channels=(8, 16))
    p = control_encoder_init(jax.random.PRNGKey(0), ecfg, CFG)
    # hint at 2x latent resolution: stages land on latent ds 1 and 2
    hint = jnp.zeros((2, 16, 16, 3))
    states = control_encoder_apply(p, ecfg, hint)
    assert len(states) == 2
    assert states[0].shape == (2, 64, CFG.model_channels)          # 8x8 → 64 tokens, width 16
    assert states[1].shape == (2, 16, CFG.model_channels * 2)      # 4x4 → 16 tokens, width 32


def test_block_ds_maps():
    # conv_in(ds1), res(ds1), down(output at ds2), res(ds2); down blocks carry no attention
    assert encoder_block_ds(CFG) == [1, 1, 2, 2]
    assert decoder_block_ds(CFG) == [2, 2, 1, 1]


def test_control_lora_identity_at_init_and_sensitivity():
    params = _params()
    ecfg = ControlLoRAEncoderConfig(stage_channels=(8, 16), rank=2)
    enc = control_encoder_init(jax.random.PRNGKey(1), ecfg, CFG)
    tree = build_control_lora_tree(params, CFG, ecfg, jax.random.PRNGKey(2))

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(4), (1, 7, CFG.context_dim))
    t = jnp.array([100])
    hint = jax.random.uniform(jax.random.PRNGKey(5), (1, 16, 16, 3))
    states = control_encoder_apply(enc, ecfg, hint)
    injected = inject_control_states(tree, CFG, states)

    e_base = unet_apply(params, CFG, x, t, ctx)
    e_ctrl = unet_apply(params, CFG, x, t, ctx, lora=injected)
    # B=0 everywhere + self_add... self_add adds raw control state into the q-lora INPUT,
    # but B_q = 0 → still identity at init.
    np.testing.assert_allclose(np.asarray(e_base), np.asarray(e_ctrl), atol=1e-5)

    # Un-zero B matrices → control now matters, and different hints give different outputs.
    nz = jax.tree.map(
        lambda l: jax.random.normal(jax.random.PRNGKey(7), l.shape) * 0.05
        if (hasattr(l, "ndim") and l.ndim == 2)
        else l,
        injected,
    )
    e1 = unet_apply(params, CFG, x, t, ctx, lora=nz)
    hint2 = jax.random.uniform(jax.random.PRNGKey(8), (1, 16, 16, 3))
    states2 = control_encoder_apply(enc, ecfg, hint2)
    nz2 = jax.tree.map(
        lambda l: jax.random.normal(jax.random.PRNGKey(7), l.shape) * 0.05
        if (hasattr(l, "ndim") and l.ndim == 2)
        else l,
        inject_control_states(tree, CFG, states2),
    )
    e2 = unet_apply(params, CFG, x, t, ctx, lora=nz2)
    assert not np.allclose(np.asarray(e1), np.asarray(e2))


def test_v2_mode_runs():
    params = _params()
    ecfg = ControlLoRAEncoderConfig(stage_channels=(8, 16), rank=2, v2=True, self_add=False)
    enc = control_encoder_init(jax.random.PRNGKey(1), ecfg, CFG)
    tree = build_control_lora_tree(params, CFG, ecfg, jax.random.PRNGKey(2))
    hint = jax.random.uniform(jax.random.PRNGKey(5), (1, 16, 16, 3))
    injected = inject_control_states(tree, CFG, control_encoder_apply(enc, ecfg, hint))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, CFG.context_dim))
    out = unet_apply(params, CFG, x, jnp.array([5]), ctx, lora=injected)
    assert np.isfinite(np.asarray(out)).all()


def test_concat_hidden_mode_runs():
    params = _params()
    ecfg = ControlLoRAEncoderConfig(stage_channels=(8, 16), rank=2, concat_hidden=True, self_add=False)
    enc = control_encoder_init(jax.random.PRNGKey(1), ecfg, CFG)
    tree = build_control_lora_tree(params, CFG, ecfg, jax.random.PRNGKey(2))
    hint = jax.random.uniform(jax.random.PRNGKey(5), (2, 16, 16, 3))
    injected = inject_control_states(tree, CFG, control_encoder_apply(enc, ecfg, hint))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 4))
    ctx = jnp.zeros((2, 7, CFG.context_dim))
    out = unet_apply(params, CFG, x, jnp.array([5, 5]), ctx, lora=injected)
    assert np.isfinite(np.asarray(out)).all()


def test_mini_encoder_ldm_native_mode():
    params = _params()
    enc = mini_control_encoder_init(jax.random.PRNGKey(0), base_channels=4)
    # mini encoder output channels = 16 == model_channels at ds 1
    hint = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    feat = mini_control_encoder_apply(enc, hint)
    assert feat.shape == (1, 8, 8, 16)

    tree = build_ldm_control_lora_tree(params, jax.random.PRNGKey(2), rank=2)
    # inject the flattened feature at ds-1 attentions (T=64 matches 8x8 latent)
    injected = inject_control_states(tree, CFG, [feat.reshape(1, 64, 16)])
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, CFG.context_dim))
    e0 = unet_apply(params, CFG, x, jnp.array([5]), ctx)
    e1 = unet_apply(params, CFG, x, jnp.array([5]), ctx, lora=injected)
    # zero-init to_control B → identity
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), atol=1e-5)


def test_control_lora_jits():
    params = _params()
    ecfg = ControlLoRAEncoderConfig(stage_channels=(8, 16), rank=2)
    enc = control_encoder_init(jax.random.PRNGKey(1), ecfg, CFG)
    tree = build_control_lora_tree(params, CFG, ecfg, jax.random.PRNGKey(2))

    @jax.jit
    def fwd(params, enc, tree, x, hint, ctx):
        states = control_encoder_apply(enc, ecfg, hint)
        injected = inject_control_states(tree, CFG, states)
        return unet_apply(params, CFG, x, jnp.array([5]), ctx, lora=injected)

    out = fwd(
        params, enc, tree,
        jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4)),
        jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, 7, CFG.context_dim)),
    )
    assert out.shape == (1, 8, 8, 4)
