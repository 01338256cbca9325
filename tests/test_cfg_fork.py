"""CFG shared-prefix fork (``DDIMConfig.cfg_fork``): batch-B latents + 2B contexts must
reproduce the plain 2B parallel-CFG forward.

Under parallel CFG the cond and uncond halves share x_t, t and the seg hint, so every op
before the FIRST cross-attention is identical for both halves; the fork runs that prefix
once at batch B and duplicates hidden states where the contexts first diverge
(``models.attention.transformer_block``). The reference always runs the two CFG branches
as separate full forwards (``BaseModel/evaluateCN.py:93-96``). The substitution is
bit-exact per op; under ``jit`` the smaller graph re-fuses, so jitted comparisons use a
~10-ULP f32 tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topomap_tpu.core import DDIMConfig, make_schedule
from topomap_tpu.pipeline import (
    PipelineConfig,
    apply_model,
    init_pipeline,
    sample,
    simulate_pretrained,
)


def assert_close(a, b, atol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=atol)


@pytest.fixture(scope="module")
def setup():
    cfg = PipelineConfig.tiny()
    params = simulate_pretrained(
        init_pipeline(jax.random.PRNGKey(0), cfg), jax.random.PRNGKey(1)
    )
    sched = make_schedule(cfg.num_train_timesteps)
    return cfg, params, sched


def _cfg_batch(cfg, b=2, size=32, seed=3, zero_uncond=True):
    """CFG-shaped inputs: shared z/t/seg across the halves, contexts differing."""
    rng = np.random.default_rng(seed)
    ds = cfg.vae.downscale
    z = jnp.asarray(rng.standard_normal((b, size // ds, size // ds, 4)), jnp.float32)
    t = jnp.asarray(rng.integers(0, 1000, (b,)), jnp.int32)
    ctx_c = rng.standard_normal((b, 77, cfg.unet.context_dim)).astype(np.float32)
    ctx_u = np.zeros_like(ctx_c) if zero_uncond else \
        rng.standard_normal(ctx_c.shape).astype(np.float32)
    ctx2 = jnp.asarray(np.concatenate([ctx_c, ctx_u]), jnp.float32)
    seg = jnp.asarray(rng.random((b, size, size, 3), np.float32))
    return z, t, ctx2, seg


@pytest.mark.parametrize("zero_uncond", [True, False])
def test_apply_model_fork_matches_2b(setup, zero_uncond):
    cfg, params, _ = setup
    b = 2
    z, t, ctx2, seg = _cfg_batch(cfg, b=b, zero_uncond=zero_uncond)
    tail = b if zero_uncond else 0

    ref = apply_model(
        params, cfg,
        jnp.concatenate([z, z]), jnp.concatenate([t, t]),
        {"crossattn": ctx2, "concat": jnp.concatenate([seg, seg])},
        zero_ctx_tail=tail,
    )
    fork = apply_model(
        params, cfg, z, t, {"crossattn": ctx2, "concat": seg}, zero_ctx_tail=tail
    )
    assert fork.shape == ref.shape == (2 * b, *z.shape[1:])
    assert_close(fork, ref)


def test_apply_model_fork_with_runtime_lora(setup):
    cfg, params, _ = setup
    from topomap_tpu.lora import LoRASpec, build_lora_tree

    lp = dict(params)
    lp["unet_lora"] = build_lora_tree(params["unet"], LoRASpec.qkvo(4), jax.random.PRNGKey(5))
    # non-zero B so the adapter actually contributes
    lp["unet_lora"] = jax.tree.map(
        lambda x: x + 0.02 if x.ndim == 2 else x, lp["unet_lora"]
    )
    b = 2
    z, t, ctx2, seg = _cfg_batch(cfg, b=b, seed=7)
    ref = apply_model(
        lp, cfg, jnp.concatenate([z, z]), jnp.concatenate([t, t]),
        {"crossattn": ctx2, "concat": jnp.concatenate([seg, seg])}, zero_ctx_tail=b,
    )
    fork = apply_model(lp, cfg, z, t, {"crossattn": ctx2, "concat": seg}, zero_ctx_tail=b)
    assert_close(fork, ref)


@pytest.mark.parametrize("deep_cache", [1, 2])
@pytest.mark.parametrize("solver", ["ddim", "dpm"])
def test_sample_fork_matches_exact(setup, deep_cache, solver):
    cfg, params, sched = setup
    b, size = 2, 32
    rng = np.random.default_rng(11)
    seg = jnp.asarray(rng.random((b, size, size, 3), np.float32))
    ctx = jnp.asarray(rng.standard_normal((b, 77, cfg.unet.context_dim)), jnp.float32)

    def run(fork):
        ddim = DDIMConfig(num_steps=4, guidance_scale=7.5, cfg_fork=fork,
                          deep_cache_interval=deep_cache, solver=solver)
        return sample(params, cfg, sched, ddim, jax.random.PRNGKey(0), seg, ctx)

    assert_close(run(True), run(False), atol=3e-5)
