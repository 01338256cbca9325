"""Golden-activation parity vs real torch/HF modules (SURVEY.md §4 plan (b)).

These tests load OUR weights into genuine torch/transformers modules (or vice versa) and
compare forward activations — validating both the checkpoint key maps and the forward-math
conventions (GELU flavor, LayerNorm placement, attention scaling, GroupNorm semantics).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from topomap_tpu.models.text_encoders import (
    TextEncoderConfig,
    text_encoder_apply,
    text_encoder_init,
)
from topomap_tpu.utils.hf_ckpt import bert_keymap, clip_text_keymap
from topomap_tpu.utils.torch_ckpt import import_keymap


def test_bert_parity_vs_transformers():
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=77, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = TextEncoderConfig(
        vocab_size=100, hidden=32, layers=2, heads=2, intermediate=64, max_len=77,
    )
    ours = text_encoder_init(jax.random.PRNGKey(0), cfg)
    ours, missing, loaded = import_keymap(ours, sd, bert_keymap(cfg))
    assert not missing and len(loaded) > 20

    ids = np.asarray([[1, 5, 9, 2, 0, 0]], np.int64)
    mask = np.asarray([[1, 1, 1, 1, 0, 0]], np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    out = np.asarray(
        text_encoder_apply(ours, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32))
    )
    np.testing.assert_allclose(out[:, :4], ref[:, :4], atol=2e-4)


def test_clip_parity_vs_transformers():
    from transformers import CLIPTextConfig, CLIPTextModel

    hf_cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=77, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = TextEncoderConfig(
        vocab_size=100, hidden=32, layers=2, heads=2, intermediate=64, max_len=77,
        causal=True, pre_layernorm=True, quick_gelu=True, token_type=False,
    )
    ours = text_encoder_init(jax.random.PRNGKey(0), cfg)
    ours, missing, loaded = import_keymap(ours, sd, clip_text_keymap(cfg))
    assert not missing and len(loaded) > 20

    ids = np.asarray([[3, 7, 11, 2, 2, 2, 2, 2]], np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    out = np.asarray(text_encoder_apply(ours, cfg, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_groupnorm_silu_conv_resblock_parity():
    """Our resblock vs a torch module with LDM's layer conventions, weights shared."""
    import torch.nn as tnn

    from topomap_tpu.models.unet import resblock, resblock_init
    from topomap_tpu.models.nn import KeyGen
    from topomap_tpu.utils.torch_ckpt import _conv_out, _lin_out

    c_in, c_out, emb_dim = 8, 16, 16
    kg = KeyGen(jax.random.PRNGKey(0))
    p = resblock_init(kg, c_in, c_out, emb_dim)
    # randomize the zero-init out conv so the whole path is exercised
    p["out_conv"]["w"] = jax.random.normal(jax.random.PRNGKey(1), p["out_conv"]["w"].shape) * 0.1

    class TorchRes(tnn.Module):
        def __init__(self):
            super().__init__()
            # LDM GroupNorm32 ⇒ min(32, C) groups at test scale
            self.in_norm = tnn.GroupNorm(min(32, c_in), c_in)
            self.in_conv = tnn.Conv2d(c_in, c_out, 3, padding=1)
            self.emb = tnn.Linear(emb_dim, c_out)
            self.out_norm = tnn.GroupNorm(min(32, c_out), c_out)
            self.out_conv = tnn.Conv2d(c_out, c_out, 3, padding=1)
            self.skip = tnn.Conv2d(c_in, c_out, 1)

        def forward(self, x, emb):
            h = self.in_conv(tnn.functional.silu(self.in_norm(x)))
            h = h + self.emb(tnn.functional.silu(emb))[:, :, None, None]
            h = self.out_conv(tnn.functional.silu(self.out_norm(h)))
            return self.skip(x) + h

    tm = TorchRes().eval()
    with torch.no_grad():
        tm.in_norm.weight.copy_(torch.from_numpy(np.asarray(p["in_norm"]["scale"])))
        tm.in_norm.bias.copy_(torch.from_numpy(np.asarray(p["in_norm"]["bias"])))
        tm.in_conv.weight.copy_(torch.from_numpy(_conv_out(np.asarray(p["in_conv"]["w"]))))
        tm.in_conv.bias.copy_(torch.from_numpy(np.asarray(p["in_conv"]["b"])))
        tm.emb.weight.copy_(torch.from_numpy(_lin_out(np.asarray(p["emb"]["w"]))))
        tm.emb.bias.copy_(torch.from_numpy(np.asarray(p["emb"]["b"])))
        tm.out_norm.weight.copy_(torch.from_numpy(np.asarray(p["out_norm"]["scale"])))
        tm.out_norm.bias.copy_(torch.from_numpy(np.asarray(p["out_norm"]["bias"])))
        tm.out_conv.weight.copy_(torch.from_numpy(_conv_out(np.asarray(p["out_conv"]["w"]))))
        tm.out_conv.bias.copy_(torch.from_numpy(np.asarray(p["out_conv"]["b"])))
        tm.skip.weight.copy_(torch.from_numpy(_conv_out(np.asarray(p["skip"]["w"]))))
        tm.skip.bias.copy_(torch.from_numpy(np.asarray(p["skip"]["b"])))

    x = np.random.default_rng(0).normal(size=(2, 6, 6, c_in)).astype(np.float32)
    emb = np.random.default_rng(1).normal(size=(2, emb_dim)).astype(np.float32)
    ours = np.asarray(resblock(p, jnp.asarray(x), jnp.asarray(emb)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(emb)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_timestep_embedding_ldm_convention():
    """cos|sin halves, freqs exp(-ln(1e4)·i/half) — matched against a direct formula."""
    from topomap_tpu.models.nn import timestep_embedding

    t = jnp.asarray([0, 1, 500])
    dim = 16
    out = np.asarray(timestep_embedding(t, dim))
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    ref = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # t=0: cos half = 1, sin half = 0
    np.testing.assert_allclose(out[0, :half], 1.0)
    np.testing.assert_allclose(out[0, half:], 0.0)


def test_lpips_vgg16_parity():
    """Pretrained-VGG LPIPS keymap + math vs a torch twin (``quantitative_metrics.py:162-196``).

    Builds a torchvision-layout VGG16 feature tower (random weights, torchvision
    ``features.{i}`` indices) plus the lpips-package forward math (ScalingLayer →
    slices → channel-unit-normalize → squared diff → 1×1 lin head → spatial mean →
    sum over slices), exports its state dict through ``import_vgg16_lpips``, and
    asserts ``lpips_distance`` matches — so real pretrained .pth files give
    reference-comparable numbers."""
    import torch.nn as nn

    from topomap_tpu.train.losses import lpips_distance
    from topomap_tpu.utils.vgg_ckpt import (
        LPIPS_SCALE,
        LPIPS_SHIFT,
        VGG16_FEATURE_IDX,
        import_vgg16_lpips,
    )

    torch.manual_seed(0)
    plan = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256), (256, 256),
            (256, 512), (512, 512), (512, 512), (512, 512), (512, 512), (512, 512)]
    # torchvision vgg16().features layout: convs at the VGG16_FEATURE_IDX positions,
    # ReLU after each conv, MaxPool(2) closing each group.
    layers, ci = {}, 0
    for group in VGG16_FEATURE_IDX:
        for idx in group:
            layers[idx] = nn.Conv2d(plan[ci][0], plan[ci][1], 3, padding=1)
            ci += 1
    pools = (4, 9, 16, 23, 30)
    features = nn.Sequential(
        *[layers[i] if i in layers else (nn.MaxPool2d(2) if i in pools else nn.ReLU())
          for i in range(31)]
    ).eval()
    # per-slice lin heads with non-negative random weights (lpips convention)
    chans = [64, 128, 256, 512, 512]
    lin_w = [torch.rand(1, c, 1, 1) * 0.1 for c in chans]
    sd = {f"features.{i}.weight": m.weight for i, m in layers.items()}
    sd.update({f"features.{i}.bias": m.bias for i, m in layers.items()})
    lin_sd = {f"lin{k}.model.1.weight": w for k, w in enumerate(lin_w)}

    rng = np.random.default_rng(3)
    a01 = rng.random((1, 64, 64, 3), np.float32)
    b01 = rng.random((1, 64, 64, 3), np.float32)

    def torch_lpips(x01, y01):
        shift = torch.tensor(LPIPS_SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(LPIPS_SCALE).view(1, 3, 1, 1)

        def feats(img01):
            x = torch.from_numpy(img01.transpose(0, 3, 1, 2)) * 2 - 1
            x = (x - shift) / scale
            outs = []
            ends = [3, 8, 15, 22, 29]  # after the closing ReLU of each slice
            for i, layer in enumerate(features):
                x = layer(x)
                if i in ends:
                    outs.append(x)
            return outs

        total = 0.0
        for fx, fy, w in zip(feats(x01), feats(y01), lin_w):
            nx = fx / (fx.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            ny = fy / (fy.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = ((nx - ny) ** 2 * w).sum(1, keepdim=True)
            total = total + d.mean(dim=(2, 3))
        return float(total)

    with torch.no_grad():
        ref = torch_lpips(a01, b01)
    p = import_vgg16_lpips(sd, lin_sd)
    out = float(lpips_distance(p, jnp.asarray(a01), jnp.asarray(b01)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-6)

    # uniform-baseline fallback (no lin heads) stays finite and symmetric
    p0 = import_vgg16_lpips(sd)
    d_ab = float(lpips_distance(p0, jnp.asarray(a01), jnp.asarray(b01)))
    d_ba = float(lpips_distance(p0, jnp.asarray(b01), jnp.asarray(a01)))
    assert np.isfinite(d_ab) and abs(d_ab - d_ba) < 1e-6
    assert abs(float(lpips_distance(p0, jnp.asarray(a01), jnp.asarray(a01)))) < 1e-8


def test_assembled_unet_controlnet_parity():
    """Assembled-model golden parity: jax ``apply_model`` (UNet + ControlNet eps) vs the
    independent torch LDM twin (``tests/torch_ldm_twin.py``) with weights shared through
    the LDM key space — catches skip-ordering / control-residual-indexing / time-embed
    wiring bugs no per-block test sees (``addlrSD.py:458-459`` contract). Then one exact
    DDIM update on both eps, closing ``test_ddim_torch_parity``'s mock-model gap."""
    from tests.torch_ldm_twin import t_apply_model

    from topomap_tpu.core import make_schedule
    from topomap_tpu.models.controlnet import hint_strides
    from topomap_tpu.pipeline import PipelineConfig, apply_model, init_pipeline, simulate_pretrained
    from topomap_tpu.utils.torch_ckpt import controlnet_keymap, export_keymap, unet_keymap

    cfg = PipelineConfig.tiny()
    # simulate_pretrained randomizes the zero_module leaves — with raw zero convs the
    # control wiring would be invisible to the comparison
    params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), cfg), jax.random.PRNGKey(1))
    params.pop("unet_lora", None)  # LoRA is out of scope for the LDM twin
    params.pop("ctrl_lora", None)

    sd = export_keymap(params["unet"], unet_keymap(cfg.unet))
    sd.update(export_keymap(params["controlnet"], controlnet_keymap(cfg.unet)))

    rng = np.random.default_rng(7)
    b, hw = 2, 8
    z = rng.normal(size=(b, hw, hw, 4)).astype(np.float32)
    hint = rng.random((b, hw * cfg.vae.downscale, hw * cfg.vae.downscale, 3)).astype(np.float32)
    ctx = rng.normal(size=(b, 6, cfg.unet.context_dim)).astype(np.float32)
    t = np.asarray([3, 641], np.int64)

    ours = np.asarray(
        apply_model(
            params, cfg, jnp.asarray(z), jnp.asarray(t, jnp.int32),
            {"crossattn": jnp.asarray(ctx), "concat": jnp.asarray(hint)},
        )
    )
    with torch.no_grad():
        ref = t_apply_model(
            sd, cfg.unet,
            torch.from_numpy(z.transpose(0, 3, 1, 2)),
            torch.from_numpy(hint.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
            torch.from_numpy(ctx),
            hint_strides(cfg.vae.downscale),
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)

    # control residuals actually flow: zeroing the hint must change eps
    ours_nohint = np.asarray(
        apply_model(
            params, cfg, jnp.asarray(z), jnp.asarray(t, jnp.int32),
            {"crossattn": jnp.asarray(ctx), "concat": jnp.zeros_like(hint)},
        )
    )
    assert np.abs(ours - ours_nohint).max() > 1e-5

    # one real-model DDIM update (eta=0) in both frameworks
    sched = make_schedule(cfg.num_train_timesteps)
    ab = np.asarray(sched.alphas_cumprod)
    a_t, a_prev = ab[641], ab[399]
    z1 = z[1:2]
    x0 = (z1 - np.sqrt(1 - a_t) * ours[1:2]) / np.sqrt(a_t)
    ours_step = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * ours[1:2]
    x0_t = (z1 - np.sqrt(1 - a_t) * ref[1:2]) / np.sqrt(a_t)
    ref_step = np.sqrt(a_prev) * x0_t + np.sqrt(1 - a_prev) * ref[1:2]
    np.testing.assert_allclose(ours_step, ref_step, atol=5e-4, rtol=1e-3)


def test_ldm_bert_tower_parity():
    """LDM from-scratch BERT tower (``x_transformer.py:219-552`` TransformerWrapper via
    ``BERTTextEncoder``, ``network.py:46-69``) vs a torch twin with the checkpoint key
    layout: pre-norm [LN, block, residual] triplets, no-bias q/k/v at fixed inner dim
    heads*dim_head (independent of model dim), GELU FF, abs pos emb, final LN."""
    import torch.nn as nn

    from topomap_tpu.models.ldm_bert import (
        LDMBertConfig,
        ldm_bert_apply,
        ldm_bert_init,
        ldm_bert_keymap,
    )

    cfg = LDMBertConfig.tiny()
    assert cfg.inner != cfg.dim  # the distinctive feature must be exercised

    torch.manual_seed(0)
    sd = {}
    prefix = "cond_stage_model.transformer"
    sd[f"{prefix}.token_emb.weight"] = torch.randn(cfg.vocab_size, cfg.dim) * 0.02
    sd[f"{prefix}.pos_emb.emb.weight"] = torch.randn(cfg.max_len, cfg.dim) * 0.02
    for i in range(cfg.depth):
        a, f = f"{prefix}.attn_layers.layers.{2*i}", f"{prefix}.attn_layers.layers.{2*i+1}"
        sd[f"{a}.0.weight"] = torch.randn(cfg.dim) * 0.1 + 1.0
        sd[f"{a}.0.bias"] = torch.randn(cfg.dim) * 0.1
        for n in ("to_q", "to_k", "to_v"):
            sd[f"{a}.1.{n}.weight"] = torch.randn(cfg.inner, cfg.dim) * 0.1
        sd[f"{a}.1.to_out.weight"] = torch.randn(cfg.dim, cfg.inner) * 0.1
        sd[f"{a}.1.to_out.bias"] = torch.randn(cfg.dim) * 0.1
        sd[f"{f}.0.weight"] = torch.randn(cfg.dim) * 0.1 + 1.0
        sd[f"{f}.0.bias"] = torch.randn(cfg.dim) * 0.1
        sd[f"{f}.1.net.0.weight"] = torch.randn(cfg.dim * 4, cfg.dim) * 0.1
        sd[f"{f}.1.net.0.bias"] = torch.randn(cfg.dim * 4) * 0.1
        sd[f"{f}.1.net.3.weight"] = torch.randn(cfg.dim, cfg.dim * 4) * 0.1
        sd[f"{f}.1.net.3.bias"] = torch.randn(cfg.dim) * 0.1
    sd[f"{prefix}.norm.weight"] = torch.randn(cfg.dim) * 0.1 + 1.0
    sd[f"{prefix}.norm.bias"] = torch.randn(cfg.dim) * 0.1

    def torch_forward(ids):
        g = lambda k: sd[f"{prefix}.{k}"]
        x = g("token_emb.weight")[ids] + g("pos_emb.emb.weight")[None, : ids.shape[1]]
        for i in range(cfg.depth):
            a, f = f"attn_layers.layers.{2*i}", f"attn_layers.layers.{2*i+1}"
            h = nn.functional.layer_norm(x, (cfg.dim,), g(f"{a}.0.weight"), g(f"{a}.0.bias"))
            q = h @ g(f"{a}.1.to_q.weight").T
            k = h @ g(f"{a}.1.to_k.weight").T
            v = h @ g(f"{a}.1.to_v.weight").T
            b, t, _ = q.shape
            sh = lambda z: z.view(b, t, cfg.heads, cfg.dim_head).transpose(1, 2)
            attn = torch.softmax(sh(q) @ sh(k).transpose(-1, -2) * cfg.dim_head**-0.5, -1)
            o = (attn @ sh(v)).transpose(1, 2).reshape(b, t, cfg.inner)
            x = x + o @ g(f"{a}.1.to_out.weight").T + g(f"{a}.1.to_out.bias")
            h = nn.functional.layer_norm(x, (cfg.dim,), g(f"{f}.0.weight"), g(f"{f}.0.bias"))
            h = nn.functional.gelu(h @ g(f"{f}.1.net.0.weight").T + g(f"{f}.1.net.0.bias"))
            x = x + h @ g(f"{f}.1.net.3.weight").T + g(f"{f}.1.net.3.bias")
        return nn.functional.layer_norm(x, (cfg.dim,), g("norm.weight"), g("norm.bias"))

    from topomap_tpu.utils.torch_ckpt import import_keymap

    ours = ldm_bert_init(jax.random.PRNGKey(0), cfg)
    sd_np = {k: v.numpy() for k, v in sd.items()}
    ours, missing, loaded = import_keymap(ours, sd_np, ldm_bert_keymap(cfg))
    assert not missing and len(loaded) == len(sd)

    ids = np.asarray([[1, 5, 9, 2, 0, 7, 3, 11]], np.int64)
    with torch.no_grad():
        ref = torch_forward(torch.from_numpy(ids)).numpy()
    out = np.asarray(ldm_bert_apply(ours, cfg, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(out, ref, atol=3e-5)
