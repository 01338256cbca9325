"""Pallas attention kernel vs the XLA reference path (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topomap_tpu.models.attention import xla_attention
from topomap_tpu.ops.flash_attention import flash_attention


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


@pytest.mark.parametrize(
    "tq,tk,d",
    [
        (256, 256, 40),   # SD self-attn head_dim 40 (unaligned)
        (128, 77, 160),   # cross-attn: 77 text tokens (unaligned T_k)
        (64, 64, 128),    # fully aligned
        (100, 77, 40),    # everything unaligned
    ],
)
def test_flash_matches_xla(tq, tk, d):
    b, h = 2, 3
    q = _rand((b, h, tq, d), 0)
    k = _rand((b, h, tk, d), 1)
    v = _rand((b, h, tk, d), 2)
    ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_bf16():
    b, h, t, d = 1, 2, 128, 64
    q = _rand((b, h, t, d), 0, jnp.bfloat16)
    k = _rand((b, h, t, d), 1, jnp.bfloat16)
    v = _rand((b, h, t, d), 2, jnp.bfloat16)
    ref = xla_attention(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref), atol=0.05)


def test_flash_softmax_stability_large_logits():
    b, h, t, d = 1, 1, 128, 128
    q = 30.0 * _rand((b, h, t, d), 0)
    k = 30.0 * _rand((b, h, t, d), 1)
    v = _rand((b, h, t, d), 2)
    out = flash_attention(q, k, v, interpret=True)
    assert np.all(np.isfinite(np.asarray(out)))


def test_flash_padded_keys_get_no_mass():
    """With T_k=77 padded to 128, outputs must match a strict 77-key reference exactly."""
    b, h, tq, tk, d = 1, 2, 64, 77, 32
    q, k, v = _rand((b, h, tq, d), 0), _rand((b, h, tk, d), 1), _rand((b, h, tk, d), 2)
    # If padded keys leaked probability mass, adding a huge-value V row at a padded slot
    # would corrupt outputs; emulate by comparing against the exact reference.
    ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize(
    "tq,tk,d",
    [
        (256, 256, 40),
        (128, 77, 160),
        (64, 64, 128),
        (100, 77, 40),
    ],
)
def test_flash_t_matches_xla(tq, tk, d):
    from topomap_tpu.ops.flash_attention import flash_attention_t

    b, h = 2, 3
    q = _rand((b, h, tq, d), 0)
    k = _rand((b, h, tk, d), 1)
    v = _rand((b, h, tk, d), 2)
    ref = xla_attention(q, k, v)
    out = flash_attention_t(q, k, v, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_t_bf16():
    from topomap_tpu.ops.flash_attention import flash_attention_t

    b, h, t, d = 1, 2, 128, 40
    q = _rand((b, h, t, d), 0, jnp.bfloat16)
    k = _rand((b, h, t, d), 1, jnp.bfloat16)
    v = _rand((b, h, t, d), 2, jnp.bfloat16)
    ref = xla_attention(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    out = flash_attention_t(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref), atol=0.05)


def test_fused_group_norm_silu_matches_reference():
    from topomap_tpu.models.nn import group_norm, silu, norm_init
    from topomap_tpu.ops.fused_norm import group_norm_silu

    for (b, h, w, c, groups) in [(2, 8, 8, 32, 32), (1, 16, 8, 320, 32), (2, 4, 4, 16, 32)]:
        x = jax.random.normal(jax.random.PRNGKey(c), (b, h, w, c), jnp.float32) * 3 + 1
        p = {
            "scale": jax.random.normal(jax.random.PRNGKey(1), (c,)) * 0.1 + 1,
            "bias": jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1,
        }
        ref = silu(group_norm(p, x, 32))
        out = group_norm_silu(p, x, 32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, err_msg=str(c))


def test_fused_group_norm_silu_bf16():
    from topomap_tpu.models.nn import group_norm, silu
    from topomap_tpu.ops.fused_norm import group_norm_silu

    x = (jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 64)) * 2).astype(jnp.bfloat16)
    p = {"scale": jnp.ones(64), "bias": jnp.zeros(64)}
    ref = silu(group_norm(p, x, 32))
    out = group_norm_silu(p, x, 32, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.03
    )


@pytest.mark.parametrize("tq,tk,d", [(256, 256, 40), (128, 77, 32), (64, 64, 128)])
def test_pallas_attention_bwd_kernel_matches_xla(tq, tk, d):
    from topomap_tpu.ops.flash_attention import flash_attention_t_bwd

    b, h = 1, 2
    q, k, v = _rand((b, h, tq, d), 0), _rand((b, h, tk, d), 1), _rand((b, h, tk, d), 2)
    g = _rand((b, h, tq, d), 3)
    # reference grads via jax autodiff of the XLA path
    ref_grads = jax.vjp(xla_attention, q, k, v)[1](g)
    got = flash_attention_t_bwd(q, k, v, g, block_q=128, interpret=True)
    for a, r in zip(got, ref_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=3e-4)


def test_gn_silu_vjp_matches_reference():
    from topomap_tpu.ops.fused_norm import _gn_silu_diff_bwd, _ref_gn_silu

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 32))
    scale = jnp.ones(32) * 1.1
    bias = jnp.zeros(32) + 0.1
    g = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    ref = jax.vjp(lambda s, b, xx: _ref_gn_silu(s, b, xx, 32, 1e-5), scale, bias, x)[1](g)
    got = _gn_silu_diff_bwd(32, 1e-5, (scale, bias, x), g)
    for a, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-5)


def test_fused_layer_norm_matches_reference():
    """Pallas one-pass LayerNorm (interpret mode) vs models.nn.layer_norm, several shapes
    including non-128 channels and non-chunk-multiple token counts handled by fallback."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from topomap_tpu.models.nn import layer_norm
    from topomap_tpu.ops.fused_norm import layer_norm_fused, ln_eligible

    for shape in [(2, 64, 320), (1, 512, 96), (2, 1024, 320)]:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(shape[-1]), 3)
        x = jax.random.normal(k1, shape, jnp.float32) * 3 + 1
        p = {"scale": jax.random.normal(k2, shape[-1:]) + 1.0,
             "bias": jax.random.normal(k3, shape[-1:])}
        ref = layer_norm(p, x)
        out = layer_norm_fused(p, x, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        assert ln_eligible(x)


def test_fused_layer_norm_bf16_and_vjp():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from topomap_tpu.models.nn import layer_norm
    from topomap_tpu.ops.fused_norm import _ln_diff_bwd, layer_norm_fused

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 160), jnp.bfloat16)
    p = {"scale": jnp.ones((160,)), "bias": jnp.zeros((160,))}
    out = layer_norm_fused(p, x, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = layer_norm(p, x)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               atol=3e-2)

    xf = x.astype(jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(1), xf.shape)
    scale, bias = p["scale"], p["bias"]
    ref_grads = jax.vjp(lambda s, b, xx: layer_norm({"scale": s, "bias": b}, xx),
                        scale, bias, xf)[1](g)
    got = _ln_diff_bwd(1e-5, (scale, bias, xf), g)
    for a, b_ in zip(got, ref_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


@pytest.mark.parametrize(
    "tq,tk,d",
    [(256, 256, 40), (128, 77, 160), (100, 77, 40)],
)
def test_flash_tt_matches_xla(tq, tk, d):
    """Pre-transposed kernel: inputs/outputs [B,H,Dh,T]."""
    from topomap_tpu.ops.flash_attention import flash_attention_tt

    b, h = 2, 3
    q = _rand((b, h, tq, d), 0)
    k = _rand((b, h, tk, d), 1)
    v = _rand((b, h, tk, d), 2)
    ref = xla_attention(q, k, v)
    tt = lambda x: x.transpose(0, 1, 3, 2)
    out_t = flash_attention_tt(tt(q), tt(k), tt(v), block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(tt(out_t)), np.asarray(ref), atol=2e-5)


def test_transposed_attention_path_in_cross_attention():
    """cross_attention must produce identical outputs through the transposed projection
    path (attn_fn.transposed=True) and the standard path, self- and cross-attention."""
    from topomap_tpu.models.attention import cross_attention, cross_attention_init
    from topomap_tpu.models.nn import KeyGen
    from topomap_tpu.ops.flash_attention import xla_attention_tt

    kg = KeyGen(jax.random.PRNGKey(0))
    x = _rand((2, 64, 32), 1)
    ctx = _rand((2, 16, 24), 2)
    p_self = cross_attention_init(kg, 32, None, 4, 8)
    p_cross = cross_attention_init(kg, 32, 24, 4, 8)
    for p, c in [(p_self, None), (p_cross, ctx)]:
        ref = cross_attention(p, x, c, heads=4, attn_fn=xla_attention)
        out = cross_attention(p, x, c, heads=4, attn_fn=xla_attention_tt)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_group_norm_fused_no_silu_matches_reference():
    from topomap_tpu.models.nn import group_norm
    from topomap_tpu.ops.fused_norm import group_norm_fused

    x = _rand((2, 8, 8, 320), 5) * 2 + 0.5
    p = {"scale": _rand((320,), 6) + 1.0, "bias": _rand((320,), 7)}
    ref = group_norm({"scale": p["scale"], "bias": p["bias"]}, x, 32)
    out = group_norm_fused(p, x, 32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gn_plain_vjp_matches_reference():
    from topomap_tpu.ops.fused_norm import _gn_plain_bwd, _ref_gn

    x = _rand((1, 4, 4, 64), 8)
    scale, bias = _rand((64,), 9) + 1.0, _rand((64,), 10)
    g = _rand(x.shape, 11)
    ref = jax.vjp(lambda s, b, xx: _ref_gn(s, b, xx, 32, 1e-5), scale, bias, x)[1](g)
    got = _gn_plain_bwd(32, 1e-5, (scale, bias, x), g)
    for a, b_ in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_transposed_attn_fn_with_runtime_lora_layout_fix():
    """A transposed-layout attn_fn must still be usable on the runtime-LoRA path (standard
    [B,H,T,Dh] tensors): cross_attention flips layouts around the call. Regression: the
    distill/train paths crashed ('Size of label d ... does not match') when the tt kernel
    became the default."""
    import jax

    from topomap_tpu.lora import LoRASpec, build_lora_tree
    from topomap_tpu.models.attention import cross_attention, xla_attention
    from topomap_tpu.ops.flash_attention import xla_attention_tt

    d, heads = 32, 4
    kg = jax.random.PRNGKey(0)
    p = {
        name: {"w": _rand((d, d), i + 1) * 0.2, "b": np.zeros(d, np.float32)}
        for i, name in enumerate(("to_q", "to_k", "to_v", "to_out"))
    }
    lora = build_lora_tree({"attn1": p}, LoRASpec.qkv(2, 2), kg)["attn1"]
    x = _rand((2, 16, d), 9)
    ctx = _rand((2, 7, d), 10)
    for context in (None, ctx):
        ref = cross_attention(p, x, context, heads, lora, attn_fn=xla_attention)
        out = cross_attention(p, x, context, heads, lora, attn_fn=xla_attention_tt)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def _rand_lora(rng, din, r, dout, scale=0.5):
    return {
        "A": jnp.asarray(rng.normal(size=(din, r), scale=0.1), jnp.float32),
        "B": jnp.asarray(rng.normal(size=(r, dout), scale=0.1), jnp.float32),
        "scale": jnp.asarray(scale, jnp.float32),
    }


def test_transposed_path_runtime_lora_matches_standard():
    """Plain runtime LoRA now rides the transpose-free projection path — outputs must
    match the standard-layout path (self- and cross-attention, masked 77-key case)."""
    import numpy as np

    from topomap_tpu.models.attention import cross_attention, cross_attention_init, xla_attention
    from topomap_tpu.models.nn import KeyGen
    from topomap_tpu.ops.flash_attention import pallas_attention_tt_interpret

    kg = KeyGen(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    p = cross_attention_init(kg, 64, None, 4, 16)
    lora = {
        "to_q": _rand_lora(rng, 64, 4, 64),
        "to_k": _rand_lora(rng, 64, 8, 64),
        "to_v": _rand_lora(rng, 64, 8, 64),
        "to_out": _rand_lora(rng, 64, 4, 64),
    }
    x = jnp.asarray(rng.normal(size=(2, 128, 64)), jnp.float32)
    ref = cross_attention(p, x, None, 4, lora, xla_attention)
    got = cross_attention(p, x, None, 4, lora, pallas_attention_tt_interpret)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=2e-4), np.abs(
        np.asarray(got) - np.asarray(ref)).max()
    # cross-attention (77 keys -> masked lane padding), partial lora (q only)
    pc = cross_attention_init(KeyGen(jax.random.PRNGKey(1)), 64, 64, 4, 16)
    ctx = jnp.asarray(rng.normal(size=(2, 77, 64)), jnp.float32)
    lora_q = {"to_q": _rand_lora(rng, 64, 4, 64)}
    ref = cross_attention(pc, x, ctx, 4, lora_q, xla_attention)
    got = cross_attention(pc, x, ctx, 4, lora_q, pallas_attention_tt_interpret)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_transposed_path_runtime_lora_grads_match():
    """Gradients w.r.t. LoRA leaves agree between the transpose-free projection path
    (xla_attention_tt, natively differentiable) and the standard path."""
    import numpy as np

    from topomap_tpu.models.attention import cross_attention, cross_attention_init, xla_attention
    from topomap_tpu.models.nn import KeyGen
    from topomap_tpu.ops.flash_attention import xla_attention_tt

    kg = KeyGen(jax.random.PRNGKey(2))
    rng = np.random.default_rng(1)
    p = cross_attention_init(kg, 32, None, 2, 16)
    lora = {
        "to_q": _rand_lora(rng, 32, 4, 32),
        "to_k": _rand_lora(rng, 32, 4, 32),
        "to_v": _rand_lora(rng, 32, 4, 32),
        "to_out": _rand_lora(rng, 32, 4, 32),
    }
    x = jnp.asarray(rng.normal(size=(2, 64, 32)), jnp.float32)

    def loss(lo, fn):
        return jnp.sum(cross_attention(p, x, None, 2, lo, fn) ** 2)

    g_ref = jax.grad(loss)(lora, xla_attention)
    g_tt = jax.grad(loss)(lora, xla_attention_tt)
    errs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), g_ref, g_tt
    )
    assert all(e < 5e-4 for e in jax.tree.leaves(errs)), errs
