"""DPM-Solver++(2M) tests: exactness on an analytically-solvable model, convergence order
vs DDIM on the real tiny pipeline, and CLI-facing wiring."""
import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.core import DDIMConfig, make_schedule
from topomap_tpu.core.ddim import ddim_sample
from topomap_tpu.core.dpm_solver import dpm_solver_sample
from topomap_tpu.pipeline import (
    PipelineConfig,
    encode_text,
    init_pipeline,
    make_tokenizers,
    sample,
    simulate_pretrained,
)

SCHED = make_schedule(1000)


def test_exact_for_constant_x0_model():
    """With eps(x,t) = (x − α_t·x0*)/σ_t the probability-flow ODE has the exact solution
    (constant x0-prediction); BOTH DDIM(eta=0) and DPM-Solver++ integrate it exactly, so
    any-step counts must agree with each other."""
    x0_star = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 4)), jnp.float32)
    ab = SCHED.alphas_cumprod

    def denoise(z, t, c):
        a = ab[t][:, None, None, None]
        return (z - jnp.sqrt(a) * x0_star) / jnp.sqrt(1.0 - a)

    cond = {"crossattn": jnp.zeros((1, 4, 8))}
    shape = (1, 8, 8, 4)
    rng = jax.random.PRNGKey(0)

    def analytic_endpoint(num_steps, x_T):
        # along the exact trajectory eps is constant: endpoint = a_f*x0* + s_f*eps_hat,
        # anchored at the ladder's own start point t0 and final ab[0]
        from topomap_tpu.core.schedules import make_ddim_timesteps

        t0 = int(make_ddim_timesteps(num_steps, SCHED.num_timesteps)[-1])
        a0, af = jnp.sqrt(ab[t0]), jnp.sqrt(ab[0])
        s0, sf = jnp.sqrt(1 - ab[t0]), jnp.sqrt(1 - ab[0])
        eps_hat = (x_T - a0 * x0_star) / s0
        return af * x0_star + sf * eps_hat

    x_T = jax.random.normal(jax.random.split(rng)[1], shape, jnp.float32)
    for steps in (7, 23):
        a = ddim_sample(denoise, SCHED, DDIMConfig(steps, 1.0, eta=0.0), rng, shape,
                        cond, cond)
        b = dpm_solver_sample(denoise, SCHED, steps, 1.0, rng, shape, cond, cond)
        ref = analytic_endpoint(steps, x_T)
        assert np.allclose(np.asarray(b), np.asarray(ref), atol=2e-3), (
            steps, float(jnp.abs(b - ref).max()))
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-3), (
            steps, float(jnp.abs(a - b).max()))


def test_second_order_beats_ddim_at_low_steps():
    """On the real (tiny, simulated-pretrained) model, 8-step DPM-Solver++ must land closer
    to the high-step reference trajectory endpoint than 8-step DDIM — the whole point of a
    second-order solver."""
    cfg = PipelineConfig.tiny()
    params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), cfg),
                                 jax.random.PRNGKey(1))
    tok, _ = make_tokenizers(cfg)
    ids, mask = tok.encode(["Set Forest color to dark green"])
    c = encode_text(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    seg = jnp.zeros((1, 32, 32, 3))
    rng = jax.random.PRNGKey(0)

    ref = sample(params, cfg, SCHED, DDIMConfig(100, 5.0, eta=0.0), rng, seg, c,
                 decode=False)
    ddim8 = sample(params, cfg, SCHED, DDIMConfig(8, 5.0, eta=0.0), rng, seg, c,
                   decode=False)
    dpm8 = sample(params, cfg, SCHED, DDIMConfig(8, 5.0, solver="dpm"), rng, seg, c,
                  decode=False)
    e_ddim = float(jnp.mean((ddim8 - ref) ** 2))
    e_dpm = float(jnp.mean((dpm8 - ref) ** 2))
    assert np.isfinite(e_dpm) and e_dpm < e_ddim, (e_dpm, e_ddim)


def test_dpm_through_sample_preview_and_cfg():
    from topomap_tpu.eval.sampling import sample_preview

    cfg = PipelineConfig.tiny()
    params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), cfg),
                                 jax.random.PRNGKey(1))
    tok, _ = make_tokenizers(cfg)
    ids, mask = tok.encode(["Set Lake color to turquoise"])
    batch = {"seg": jnp.zeros((1, 32, 32, 3)), "ids": jnp.asarray(ids),
             "mask": jnp.asarray(mask)}
    img = sample_preview(params, cfg, SCHED, batch, steps=3, scale=7.5, solver="dpm")
    assert img.shape == (1, 32, 32, 3) and np.isfinite(np.asarray(img)).all()


def test_dpm_deepcache_composition():
    """DeepCache composed with the DPM solver: interval 2 refreshes on even solver steps
    and must stay finite and near the exact solver (the refresh-path's bit-exactness vs
    apply_model is covered by test_apply_model_cached_refresh_matches_exact)."""
    cfg = PipelineConfig.tiny()
    params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), cfg),
                                 jax.random.PRNGKey(1))
    tok, _ = make_tokenizers(cfg)
    ids, mask = tok.encode(["Set Forest color to dark green"])
    c = encode_text(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    seg = jnp.zeros((1, 32, 32, 3))
    rng = jax.random.PRNGKey(0)

    exact = sample(params, cfg, SCHED, DDIMConfig(4, 7.5, solver="dpm"), rng, seg, c,
                   decode=False)
    dc2 = sample(params, cfg, SCHED,
                 DDIMConfig(4, 7.5, solver="dpm", deep_cache_interval=2), rng, seg, c,
                 decode=False)
    assert dc2.shape == exact.shape and np.isfinite(np.asarray(dc2)).all()
    assert float(jnp.abs(dc2 - exact).mean()) < 1.0
