import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.models.adapters import (
    AdapterConfig,
    adapter_apply,
    adapter_init,
    bert_align_apply,
    bert_align_init,
    pooler_mlp_apply,
    pooler_mlp_init,
    token_align,
)
from topomap_tpu.models.text_encoders import TextEncoderConfig, text_encoder_apply, text_encoder_init
from topomap_tpu.text import (
    CLIPTokenizer,
    WordPieceTokenizer,
    add_style_prefix,
    embfussion_init,
    fuse_embfussion,
    fuse_pad,
    fuse_pad_soft,
    fuse_tokenadd,
    fuse_tokenjoint,
)


def test_wordpiece_tokenizer_shapes_and_determinism():
    tok = WordPieceTokenizer()
    ids, mask = tok.encode(["Set Forest color to dark green", ""])
    assert ids.shape == (2, 77) and mask.shape == (2, 77)
    assert ids[0, 0] == tok.cls_id
    assert mask[1].sum() == 2  # [CLS] [SEP]
    ids2, _ = tok.encode(["Set Forest color to dark green", ""])
    np.testing.assert_array_equal(ids, ids2)
    # domain words get distinct non-special ids
    assert len({int(i) for i in ids[0][: int(mask[0].sum())]}) > 4


def test_clip_tokenizer_eot_padding_and_index():
    tok = CLIPTokenizer()
    ids = tok.encode(["dark green forest"])
    assert ids.shape == (1, 77)
    assert ids[0, 0] == tok.sot_id
    eot = tok.first_eot_index(ids)
    assert 1 < eot[0] < 10
    assert np.all(ids[0, eot[0]:] == tok.eot_id)


def test_bert_encoder_mask_invariance():
    """Padding content must not influence unmasked positions."""
    cfg = TextEncoderConfig.tiny()
    p = text_encoder_init(jax.random.PRNGKey(0), cfg)
    ids = np.zeros((1, 10), np.int32)
    ids[0, :4] = [1, 5, 6, 2]
    mask = np.zeros((1, 10), np.int32)
    mask[0, :4] = 1
    out1 = text_encoder_apply(p, cfg, jnp.asarray(ids), jnp.asarray(mask))
    ids2 = ids.copy()
    ids2[0, 5:] = 99  # change padding tokens
    out2 = text_encoder_apply(p, cfg, jnp.asarray(ids2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out1[:, :4]), np.asarray(out2[:, :4]), atol=1e-5)


def test_clip_encoder_causality():
    """In the causal CLIP tower, position i must not depend on tokens after i."""
    cfg = TextEncoderConfig.tiny(causal=True)
    p = text_encoder_init(jax.random.PRNGKey(0), cfg)
    ids = np.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], np.int32)
    out1 = text_encoder_apply(p, cfg, jnp.asarray(ids))
    ids2 = ids.copy()
    ids2[0, -1] = 100
    out2 = text_encoder_apply(p, cfg, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(out1[:, :-1]), np.asarray(out2[:, :-1]), atol=1e-5)
    assert not np.allclose(np.asarray(out1[:, -1]), np.asarray(out2[:, -1]))


def test_adapter_shapes_and_depth():
    cfg = AdapterConfig(dim=32, hidden=32, depth=3)
    p = adapter_init(jax.random.PRNGKey(0), cfg)
    assert len(p["blocks"]) == 3
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32))
    y = adapter_apply(p, cfg, x)
    assert y.shape == x.shape
    # final LN → per-token unit variance
    v = np.asarray(y).var(axis=-1)
    np.testing.assert_allclose(v, 1.0, atol=0.2)


def test_bert_align_identity_at_init():
    p = bert_align_init(jax.random.PRNGKey(0), dim=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
    np.testing.assert_allclose(np.asarray(bert_align_apply(p, x)), np.asarray(x), atol=1e-6)


def test_pooler_adds_same_vector_to_all_tokens():
    p = pooler_mlp_init(jax.random.PRNGKey(0), dim=16, hidden=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 16))
    y = pooler_mlp_apply(p, x)
    delta = np.asarray(y - x)
    for t in range(1, 5):
        np.testing.assert_allclose(delta[0, t], delta[0, 0], atol=1e-6)


def test_token_align_preserves_mean_and_length():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 30, 8))
    y = token_align(x, 10)
    assert y.shape == (2, 10, 8)
    np.testing.assert_allclose(np.asarray(y.mean(axis=1)), np.asarray(x.mean(axis=1)), atol=1e-5)
    # identity when already target length
    np.testing.assert_array_equal(np.asarray(token_align(x, 30)), np.asarray(x))


def test_fuse_pad_semantics():
    b, d = 2, 8
    clip = jnp.ones((b, 77, d))
    bert = jax.random.normal(jax.random.PRNGKey(0), (b, 77, d))
    cond, uc = fuse_pad(clip, bert, gamma=1.0, w_clip=0.4, start_idx=8)
    np.testing.assert_allclose(np.asarray(uc), 0.4, atol=1e-6)
    # slots [0,8) untouched: cond == w_clip*clip there
    np.testing.assert_allclose(np.asarray(cond[:, :8]), 0.4, atol=1e-6)
    # slots [8,77) differ (bert tail added)
    assert not np.allclose(np.asarray(cond[:, 8:]), 0.4)


def test_fuse_pad_soft_respects_per_sample_start():
    b, d, lb = 2, 4, 3
    clip = jnp.zeros((b, 10, d))
    uc_clip = jnp.zeros((b, 10, d))
    bert = jnp.ones((b, lb, d))
    start = jnp.asarray([2, 5])
    cond, uc = fuse_pad_soft(clip, uc_clip, bert, start, gamma=1.0, uc_mix=0.5)
    c = np.asarray(cond)
    # LN of constant-ones is 0 → written slots become 0 == replaced by LN'd bert... use
    # varying bert instead for a strict check:
    bert = jnp.asarray(np.random.default_rng(0).normal(size=(b, lb, d)), jnp.float32)
    cond, uc = fuse_pad_soft(clip, uc_clip, bert, start, gamma=1.0, uc_mix=0.5)
    c, u = np.asarray(cond), np.asarray(uc)
    assert np.allclose(c[0, :2], 0) and not np.allclose(c[0, 2:5], 0) and np.allclose(c[0, 5:], 0)
    assert np.allclose(c[1, :5], 0) and not np.allclose(c[1, 5:8], 0) and np.allclose(c[1, 8:], 0)
    np.testing.assert_allclose(u[0, 2:5], 0.5 * c[0, 2:5], atol=1e-6)


def test_fuse_tokenadd_tokenjoint():
    clip = jnp.ones((1, 77, 4))
    bert = 2 * jnp.ones((1, 77, 4))
    cond, uc = fuse_tokenadd(clip, bert)
    np.testing.assert_allclose(np.asarray(cond), 3.0)
    np.testing.assert_allclose(np.asarray(uc), 1.0)
    cond_j, uc_j = fuse_tokenjoint(clip, bert[:, :5])
    assert cond_j.shape == (1, 82, 4) and uc_j.shape == (1, 82, 4)
    np.testing.assert_allclose(np.asarray(uc_j[:, 77:]), 0.0)


def test_embfussion_identity_adapter_at_init():
    p = embfussion_init(dim=8)
    clip = jax.random.normal(jax.random.PRNGKey(0), (1, 77, 8))
    bert = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 8))
    cond, uc = fuse_embfussion(p, clip, bert)
    # zero-init adapter → cond == LN(clip) == uc at init
    np.testing.assert_allclose(np.asarray(cond), np.asarray(uc), atol=1e-6)


def test_add_style_prefix():
    out = add_style_prefix(["dark green forest", ""])
    assert out[0].startswith("map in swiss topo style, ")
    assert out[1] == "map in swiss topo style"
