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
