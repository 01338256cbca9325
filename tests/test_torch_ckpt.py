"""Checkpoint conversion roundtrip: export our tree to the LDM key space, reimport, compare.

Also cross-checks the exported layouts against real torch modules (torch is CPU-baked) so
the Linear/Conv transpose conventions match what an actual LDM checkpoint would contain.
"""
import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.models.controlnet import controlnet_init
from topomap_tpu.models.unet import UNetConfig, unet_init, unet_apply
from topomap_tpu.models.vae import VAEConfig, vae_init, vae_encode
from topomap_tpu.utils.torch_ckpt import (
    controlnet_keymap,
    export_keymap,
    import_keymap,
    load_sd_checkpoint,
    unet_keymap,
    vae_keymap,
)

CFG = UNetConfig.tiny()


def _randomize(tree, seed=3):
    leaves, td = jax.tree.flatten(tree)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree.unflatten(td, [jax.random.normal(k, l.shape) * 0.1 for k, l in zip(keys, leaves)])


def test_unet_roundtrip_exact():
    p = _randomize(unet_init(jax.random.PRNGKey(0), CFG))
    km = unet_keymap(CFG)
    sd = export_keymap(p, km)
    # every exported key unique and loadable
    assert len(sd) == len({k for k in sd})
    blank = unet_init(jax.random.PRNGKey(1), CFG)
    loaded, missing, n = import_keymap(blank, sd, km)
    assert not missing
    a, b = jax.tree.leaves(p), jax.tree.leaves(loaded)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    # behavioral equality
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 7, CFG.context_dim))
    np.testing.assert_allclose(
        np.asarray(unet_apply(p, CFG, x, jnp.array([5]), ctx)),
        np.asarray(unet_apply(loaded, CFG, x, jnp.array([5]), ctx)),
        atol=1e-6,
    )


def test_unet_export_covers_all_leaves():
    """Every parameter leaf must appear in the key map (no silent unconverted weights)."""
    p = unet_init(jax.random.PRNGKey(0), CFG)
    km = unet_keymap(CFG)
    covered = {path for _k, path, _i, _e in km}
    flat = jax.tree_util.tree_flatten_with_path(p)[0]

    def to_path(kp):
        out = []
        for e in kp:
            out.append(e.key if hasattr(e, "key") else e.idx)
        return tuple(out)

    missing = [to_path(kp) for kp, _ in flat if to_path(kp) not in covered]
    assert not missing, missing[:5]


def test_controlnet_roundtrip_exact():
    p = _randomize(controlnet_init(jax.random.PRNGKey(0), CFG))
    km = controlnet_keymap(CFG)
    sd = export_keymap(p, km)
    blank = controlnet_init(jax.random.PRNGKey(1), CFG)
    loaded, missing, _ = import_keymap(blank, sd, km)
    assert not missing
    for x, y in zip(jax.tree.leaves(p), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_vae_roundtrip_exact():
    cfg = VAEConfig.tiny()
    p = _randomize(vae_init(jax.random.PRNGKey(0), cfg))
    km = vae_keymap(cfg)
    sd = export_keymap(p, km)
    blank = vae_init(jax.random.PRNGKey(1), cfg)
    loaded, missing, _ = import_keymap(blank, sd, km)
    assert not missing
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3))
    np.testing.assert_allclose(
        np.asarray(vae_encode(p, cfg, img)[0]),
        np.asarray(vae_encode(loaded, cfg, img)[0]),
        atol=1e-6,
    )


def test_layout_matches_real_torch_modules():
    """A torch Linear/Conv2d with weights from our exporter must compute the same function."""
    import torch

    # Linear
    w = np.random.default_rng(0).normal(size=(6, 4)).astype(np.float32)  # ours [in,out]
    b = np.random.default_rng(1).normal(size=(4,)).astype(np.float32)
    lin = torch.nn.Linear(6, 4)
    from topomap_tpu.utils.torch_ckpt import _lin_out, _conv_out

    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(_lin_out(w)))
        lin.bias.copy_(torch.from_numpy(b))
    x = np.random.default_rng(2).normal(size=(2, 6)).astype(np.float32)
    ours = x @ w + b
    theirs = lin(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    # Conv2d NHWC/HWIO vs NCHW/OIHW
    wk = np.random.default_rng(3).normal(size=(3, 3, 5, 7)).astype(np.float32)  # HWIO
    conv_t = torch.nn.Conv2d(5, 7, 3, padding=1, bias=False)
    with torch.no_grad():
        conv_t.weight.copy_(torch.from_numpy(_conv_out(wk)))
    xi = np.random.default_rng(4).normal(size=(1, 8, 8, 5)).astype(np.float32)
    theirs = conv_t(torch.from_numpy(xi.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    import jax.numpy as jnp
    from topomap_tpu.models.nn import conv as our_conv

    ours = np.asarray(our_conv({"w": jnp.asarray(wk), "b": jnp.zeros(7)}, jnp.asarray(xi)))
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_load_sd_checkpoint_strict_false_overlay():
    from topomap_tpu.pipeline import PipelineConfig, init_pipeline

    cfg = PipelineConfig.tiny()
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    # partial checkpoint: only the UNet time_embed
    donor = _randomize(params["unet"])
    full_sd = export_keymap(donor, unet_keymap(cfg.unet))
    partial = {k: v for k, v in full_sd.items() if "time_embed" in k}
    partial["garbage.key"] = np.zeros(3, np.float32)
    new_params, report = load_sd_checkpoint(params, cfg, partial)
    # loaded keys applied
    np.testing.assert_allclose(
        np.asarray(new_params["unet"]["time_embed"]["fc1"]["w"]),
        np.asarray(donor["time_embed"]["fc1"]["w"]),
        atol=1e-6,
    )
    # unloaded keys preserved
    np.testing.assert_array_equal(
        np.asarray(new_params["unet"]["out_conv"]["w"]),
        np.asarray(params["unet"]["out_conv"]["w"]),
    )
    assert report["unexpected"] == ["garbage.key"]
    # 4 UNet time_embed keys + 4 synthesized control_model copies (auto-attach on
    # plain-SD dicts, see test_attach_control_from_unet)
    assert report["loaded"] == 8
    assert report["controlnet_attached_from_unet"] == 4


def test_attach_control_from_unet():
    """tool_add_control equivalent: a plain SD1.5-format dict (no control_model.* keys)
    yields a ControlNet whose encoder/middle equal the UNet weights, with zero convs
    still zero (BaseModel/README.docx attach step)."""
    from topomap_tpu.pipeline import PipelineConfig, init_pipeline
    from topomap_tpu.utils.torch_ckpt import vae_keymap

    cfg = PipelineConfig.tiny()
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    donor_unet = _randomize(params["unet"])
    donor_vae = _randomize(params["vae"])
    sd = export_keymap(donor_unet, unet_keymap(cfg.unet))
    sd.update(export_keymap(donor_vae, vae_keymap(cfg.vae)))
    assert not any(k.startswith("control_model.") for k in sd)

    new_params, report = load_sd_checkpoint(params, cfg, sd)
    assert report["controlnet_attached_from_unet"] > 0
    cn = new_params["controlnet"]
    # shared structure copied from the UNet
    np.testing.assert_allclose(
        np.asarray(cn["time_embed"]["fc1"]["w"]),
        np.asarray(donor_unet["time_embed"]["fc1"]["w"]),
    )
    np.testing.assert_allclose(
        np.asarray(cn["middle"]["res1"]["in_conv"]["w"]),
        np.asarray(donor_unet["middle"]["res1"]["in_conv"]["w"]),
    )
    # ControlNet-only parts untouched: zero convs remain exactly zero
    for zc in cn["zero_convs"]:
        assert not np.asarray(zc["w"]).any()
    assert not np.asarray(cn["middle_block_out"]["w"]).any()
    # the only missing keymap entries are the ControlNet-only ones
    assert all(
        ("input_hint_block" in k) or ("zero_convs" in k) or ("middle_block_out" in k)
        for k in report["missing"]
    ), report["missing"][:5]
