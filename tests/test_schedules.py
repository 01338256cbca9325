import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.core import (
    make_schedule,
    q_sample,
    predict_start_from_noise,
    make_ddim_timesteps,
)


def test_scaled_linear_betas_match_sd15():
    s = make_schedule(1000)
    betas = np.asarray(s.betas)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-5)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-5)
    # alpha_bar strictly decreasing in (0, 1]
    ab = np.asarray(s.alphas_cumprod)
    assert np.all(np.diff(ab) < 0) and ab[0] < 1.0 and ab[-1] > 0.0
    # known SD1.5 value: alpha_bar[999] ~ 0.0047 (LDM table)
    assert 0.003 < ab[-1] < 0.007


def test_q_sample_roundtrip():
    s = make_schedule(1000)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0, 700], jnp.int32)
    xt = q_sample(s, x0, t, noise)
    x0_rec = predict_start_from_noise(s, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-3)


def test_q_sample_t0_nearly_identity():
    s = make_schedule(1000)
    x0 = jnp.ones((1, 4, 4, 4))
    noise = jnp.zeros_like(x0)
    xt = q_sample(s, x0, jnp.array([0]), noise)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(x0) * float(np.sqrt(1 - 0.00085)), rtol=1e-5)


def test_ddim_timesteps_uniform():
    ts = make_ddim_timesteps(20, 1000)
    assert ts.shape == (20,)
    assert ts[0] == 1 and ts[1] == 51 and ts[-1] == 951
    ts12 = make_ddim_timesteps(12, 1000)
    assert ts12[0] == 1 and np.all(np.diff(ts12) == 1000 // 12)
