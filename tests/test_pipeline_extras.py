"""Pipeline edge coverage: control scales in sampling, CN-LoRA in the full pipeline,
guess-mode schedule in stylize_sheet, merge-then-sample equivalence."""
import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.core import DDIMConfig, guess_mode_control_scales, make_schedule
from topomap_tpu.lora import LoRASpec
from topomap_tpu.pipeline import (
    PipelineConfig,
    apply_model,
    encode_text,
    init_pipeline,
    make_tokenizers,
    merge_for_sampling,
    sample,
    simulate_pretrained,
)

CFG = PipelineConfig.tiny()
SCHED = make_schedule(1000)


def _params(cfg=CFG):
    return simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), cfg), jax.random.PRNGKey(1))


def test_sample_with_guess_mode_scales():
    params = _params()
    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Set Lake color to turquoise"])
    c = encode_text(params, CFG, jnp.asarray(ids), jnp.asarray(mask))
    seg = jnp.zeros((1, 32, 32, 3))
    # tiny config has 5 control residuals
    scales = guess_mode_control_scales(1.0, n=5)
    out = sample(params, CFG, SCHED, DDIMConfig(2, 9.0), jax.random.PRNGKey(0), seg, c,
                 control_scales=scales)
    assert out.shape == (1, 32, 32, 3) and np.isfinite(np.asarray(out)).all()


def test_merge_then_sample_equals_runtime_lora_sampling():
    params = _params()
    # make LoRA non-trivial
    for coll in ("unet_lora", "ctrl_lora"):
        params[coll] = jax.tree.map(
            lambda x: jax.random.normal(jax.random.PRNGKey(3), x.shape) * 0.05
            if (hasattr(x, "ndim") and x.ndim == 2) else x,
            params[coll],
        )
    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Set Building color to red"])
    c = encode_text(params, CFG, jnp.asarray(ids), jnp.asarray(mask))
    seg = jnp.zeros((1, 32, 32, 3))
    ddim = DDIMConfig(3, 7.5)
    out_runtime = sample(params, CFG, SCHED, ddim, jax.random.PRNGKey(0), seg, c)
    merged = merge_for_sampling(params)
    out_merged = sample(merged, CFG, SCHED, ddim, jax.random.PRNGKey(0), seg, c)
    np.testing.assert_allclose(np.asarray(out_runtime), np.asarray(out_merged), atol=2e-4)


def test_conditional_cn_lora_full_pipeline_step():
    cond_dim = CFG.unet.model_channels + CFG.unet.context_dim
    cfg = dc.replace(CFG, ctrl_lora=LoRASpec.cn_lora(2, cond_dim=cond_dim))
    params = _params(cfg)
    # nonzero B so the conditional branch matters
    params["ctrl_lora"] = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(5), x.shape) * 0.05
        if (hasattr(x, "ndim") and x.ndim == 2) else x,
        params["ctrl_lora"],
    )
    from topomap_tpu.eval.sampling import pooled_seg_feature
    from topomap_tpu.lora import attach_condition

    tok, _ = make_tokenizers(cfg)
    ids, mask = tok.encode(["Set Forest color to olive"])
    c = encode_text(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    seg = jax.random.uniform(jax.random.PRNGKey(7), (1, 32, 32, 3))
    seg_feat = pooled_seg_feature(params, cfg, seg)
    feat = jnp.concatenate([seg_feat, c.mean(axis=1)], axis=-1)
    p2 = dict(params, ctrl_lora=attach_condition(params["ctrl_lora"], feat))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    eps = apply_model(p2, cfg, z, jnp.asarray([10]), {"crossattn": c, "concat": seg})
    assert np.isfinite(np.asarray(eps)).all()
    # different condition → different eps
    p3 = dict(params, ctrl_lora=attach_condition(params["ctrl_lora"], feat * 0.0))
    eps2 = apply_model(p3, cfg, z, jnp.asarray([10]), {"crossattn": c, "concat": seg})
    assert not np.allclose(np.asarray(eps), np.asarray(eps2))


def test_stylize_sheet_with_contours_and_scales():
    from PIL import Image

    from topomap_tpu.data.synthetic import generate_seg_tile
    from topomap_tpu.eval.sampling import stylize_sheet

    params = _params()
    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Render River in bold outline style"])
    c = encode_text(params, CFG, jnp.asarray(ids), jnp.asarray(mask))
    sheet = np.concatenate([generate_seg_tile(i)[:32, :32] for i in range(2)], axis=1)
    contours = np.zeros_like(sheet)
    contours[5, 5] = (184, 94, 20)
    out = stylize_sheet(
        params, CFG, SCHED, jnp.asarray(sheet),
        crossattn_fn=lambda n: jnp.tile(c, (n, 1, 1)),
        tile=32, steps=2, batch_tiles=1,
        control_scales=guess_mode_control_scales(1.0, n=5),
        contours_u8=jnp.asarray(contours),
    )
    assert out.shape == (32, 64, 3)


def test_stylize_sheet_overlap_blend():
    """Overlapped-tile seam blending: full pipeline on a 32x64 sheet of 32-tiles with
    16 px overlap — output geometry matches and values are finite/uint8."""
    from topomap_tpu.data.synthetic import generate_seg_tile
    from topomap_tpu.eval.sampling import stylize_sheet

    params = _params()
    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Set Forest color to dark green"])
    c = encode_text(params, CFG, jnp.asarray(ids), jnp.asarray(mask))
    sheet = np.concatenate([generate_seg_tile(i)[:32, :32] for i in range(2)], axis=1)
    out = stylize_sheet(
        params, CFG, SCHED, jnp.asarray(sheet),
        crossattn_fn=lambda n: jnp.tile(c, (n, 1, 1)),
        tile=32, steps=2, batch_tiles=2, overlap=16,
    )
    assert out.shape == (32, 64, 3) and out.dtype == jnp.uint8


def test_stylize_sheet_consistency_sampler():
    """Sheet pipeline with the few-step consistency student (CFG-free, single eval/step)."""
    from topomap_tpu.data.synthetic import generate_seg_tile
    from topomap_tpu.eval.sampling import stylize_sheet

    params = _params()
    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Set Forest color to dark green"])
    c = encode_text(params, CFG, jnp.asarray(ids), jnp.asarray(mask))
    sheet = np.concatenate([generate_seg_tile(i)[:32, :32] for i in range(2)], axis=1)
    out = stylize_sheet(
        params, CFG, SCHED, jnp.asarray(sheet),
        crossattn_fn=lambda n: jnp.tile(c, (n, 1, 1)),
        tile=32, steps=2, batch_tiles=2, sampler="consistency",
    )
    assert out.shape == (32, 64, 3) and out.dtype == jnp.uint8


def test_hint_features_hoisting_exact():
    """Precomputed cond['hint_features'] must reproduce the in-graph hint block exactly
    (the sampler hoists it out of the DDIM scan)."""
    import jax.numpy as jnp

    from topomap_tpu.pipeline import apply_model, hint_features

    params = _params()
    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Set Lake color to navy blue"])
    c = encode_text(params, CFG, jnp.asarray(ids), jnp.asarray(mask))
    seg = jnp.linspace(0, 1, 32 * 32 * 3).reshape(1, 32, 32, 3)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    t = jnp.asarray([321], jnp.int32)
    ref = apply_model(params, CFG, z, t, {"crossattn": c, "concat": seg})
    gh = hint_features(params, CFG, seg)
    out = apply_model(
        params, CFG, z, t, {"crossattn": c, "concat": seg, "hint_features": gh}
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_apply_model_cached_refresh_matches_exact():
    """refresh=True must reproduce apply_model bit-for-bit (same math, split execution)."""
    import jax.numpy as jnp

    from topomap_tpu.pipeline import apply_model, apply_model_cached, deep_cache_shape

    params = _params()
    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Set Lake color to navy blue", "Render Road as dashed"])
    c = encode_text(params, CFG, jnp.asarray(ids), jnp.asarray(mask))
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    t = jnp.asarray([100, 700], jnp.int32)
    cond = {"crossattn": c, "concat": jnp.zeros((2, 32, 32, 3))}
    ref = apply_model(params, CFG, z, t, cond)
    cache0 = {"h_deep": jnp.zeros(deep_cache_shape(CFG, 2, (16, 16)), CFG.compute_dtype)}
    eps, cache = apply_model_cached(params, CFG, z, t, cond, cache0, refresh=jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(eps), np.asarray(ref), atol=1e-5)
    assert cache["h_deep"].shape == cache0["h_deep"].shape
    assert not np.allclose(np.asarray(cache["h_deep"]), 0)

    # reuse step: stale cache + refresh=False gives a DIFFERENT (approximate) eps, finite
    eps2, cache2 = apply_model_cached(
        params, CFG, z, t + 1, cond, cache, refresh=jnp.asarray(False)
    )
    np.testing.assert_array_equal(np.asarray(cache2["h_deep"]), np.asarray(cache["h_deep"]))
    assert np.isfinite(np.asarray(eps2)).all()


def test_sample_with_deep_cache_interval():
    import jax.numpy as jnp

    from topomap_tpu.core import DDIMConfig

    params = _params()
    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Set Forest color to dark green"])
    c = encode_text(params, CFG, jnp.asarray(ids), jnp.asarray(mask))
    seg = jnp.zeros((1, 32, 32, 3))
    exact = sample(params, CFG, SCHED, DDIMConfig(4, 7.5), jax.random.PRNGKey(0), seg, c)
    dc = sample(params, CFG, SCHED, DDIMConfig(4, 7.5, deep_cache_interval=2),
                jax.random.PRNGKey(0), seg, c)
    assert dc.shape == exact.shape and np.isfinite(np.asarray(dc)).all()
    # interval 2 refreshes on steps 0 and 2; steps 1/3 reuse → differs from exact but stays
    # in the same range on the tiny model
    assert float(jnp.abs(dc - exact).mean()) < 1.0


def test_avgpool_tokens_matches_manual():
    from topomap_tpu.models.attention import _avgpool_tokens

    t = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 8))  # 4x4 spatial
    manual = t.reshape(2, 2, 2, 2, 2, 8).mean(axis=(2, 4)).reshape(2, 4, 8)
    assert np.allclose(np.asarray(_avgpool_tokens(t, 4, 4, 2)), np.asarray(manual), atol=1e-6)


def test_kv_downsample_todo_sampling():
    """ToDo K/V pooling (with_kv_downsample): inert above threshold, well-behaved below."""
    from topomap_tpu.models.attention import with_kv_downsample, xla_attention

    params = _params()
    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Set Forest color to dark green"])
    c = encode_text(params, CFG, jnp.asarray(ids), jnp.asarray(mask))
    seg = jnp.zeros((1, 32, 32, 3))
    ddim = DDIMConfig(2, 7.5)
    rng = jax.random.PRNGKey(0)
    exact = sample(params, CFG, SCHED, ddim, rng, seg, c)
    # threshold above every level -> the wrapper must be exactly inert
    inert = sample(params, CFG, SCHED, ddim, rng, seg, c,
                   attn_fn=with_kv_downsample(xla_attention, 2, min_tokens=10_000))
    assert np.array_equal(np.asarray(inert), np.asarray(exact))
    # active at the 64-token level: output keeps shape, stays finite, differs from exact
    todo = sample(params, CFG, SCHED, ddim, rng, seg, c,
                  attn_fn=with_kv_downsample(xla_attention, 2, min_tokens=16))
    todo_np = np.asarray(todo)
    assert todo_np.shape == exact.shape and np.isfinite(todo_np).all()
    assert not np.array_equal(todo_np, np.asarray(exact))
    assert float(jnp.abs(todo - exact).mean()) < 1.0


def test_kv_downsample_env_knob(monkeypatch):
    from topomap_tpu.ops.flash_attention import best_attention_fn

    monkeypatch.setenv("TOPOMAP_KV_DS", "2:256")
    fn = best_attention_fn()
    assert getattr(fn, "kv_ds", 0) == 2 and fn.kv_ds_min_tokens == 256
    monkeypatch.setenv("TOPOMAP_KV_DS", "4")
    fn = best_attention_fn()
    assert fn.kv_ds == 4 and fn.kv_ds_min_tokens == 1024


def test_kv_downsample_with_transposed_pallas_interpret():
    """ToDo pooling through the transposed-kernel path (fused wkv on the pooled context,
    mask sentinel for the non-lane-aligned pooled Tk) — interpret mode."""
    from topomap_tpu.models.attention import with_kv_downsample, xla_attention
    from topomap_tpu.ops.flash_attention import pallas_attention_tt_interpret

    params = _params()
    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Render Road as a dashed line pattern"])
    c = encode_text(params, CFG, jnp.asarray(ids), jnp.asarray(mask))
    seg = jnp.zeros((1, 32, 32, 3))
    merged = merge_for_sampling(dict(params))
    fn = with_kv_downsample(pallas_attention_tt_interpret, 2, min_tokens=16)
    out = sample(merged, CFG, SCHED, DDIMConfig(2, 7.5), jax.random.PRNGKey(0), seg, c,
                 attn_fn=fn)
    ref = sample(merged, CFG, SCHED, DDIMConfig(2, 7.5), jax.random.PRNGKey(0), seg, c,
                 attn_fn=with_kv_downsample(xla_attention, 2, min_tokens=16))
    # same ToDo math through the Pallas kernel vs the XLA reference path
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-2)
