"""Distillation subsystem: guidance-distilled CFG-free student, consistency (LCM-style)
student, and the few-step consistency sampler. All at tiny scale on the CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.core import DDIMConfig, boundary_scalings, make_schedule
from topomap_tpu.pipeline import (
    PipelineConfig,
    apply_model,
    encode_text,
    init_pipeline,
    make_tokenizers,
    sample,
    sample_consistency,
    simulate_pretrained,
)
from topomap_tpu.train.distill import (
    DistillConfig,
    init_distill_state,
    make_distill_step,
    prepare_student,
    teacher_view,
)
from topomap_tpu.train.optim import LABELERS, ParamPartition
import optax

CFG = PipelineConfig.tiny()
SCHED = make_schedule(1000)


def _student_params(dcfg):
    params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), CFG), jax.random.PRNGKey(1))
    return prepare_student(params, CFG, dcfg, jax.random.PRNGKey(2))


def _batch(b=2):
    tok, _ = make_tokenizers(CFG)
    prompts = ["Set Forest color to dark green", "Render Road as dashed"][:b]
    ids, mask = tok.encode(prompts)
    return {
        "seg": jnp.zeros((b, 32, 32, 3)),
        "gt": jnp.linspace(-1, 1, b * 32 * 32 * 3).reshape(b, 32, 32, 3),
        "ids": jnp.asarray(ids),
        "mask": jnp.asarray(mask),
    }


def test_consistency_timesteps_top_anchored():
    """The few-step sampling ladder must START (descending) at t=T−1: the pure-noise x_T
    only matches the training marginal at the top of the trajectory. Regression: the
    bottom-anchored DDIM ladder put the 1-step eval at t=1 (f of pure noise ≈ noise)."""
    from topomap_tpu.core import make_consistency_timesteps, make_ddim_timesteps

    for s in (1, 2, 4, 8, 50):
        ts = make_consistency_timesteps(s, 1000)
        assert ts[-1] == 999, (s, ts)
        assert len(ts) == s and (np.diff(ts) > 0).all()
    np.testing.assert_array_equal(make_consistency_timesteps(4, 1000), [249, 499, 749, 999])
    # the DDIM train-time ladder stays bottom-anchored (boundary coverage near t=0)
    assert make_ddim_timesteps(50, 1000)[0] == 1


def test_boundary_scalings_identity_at_zero():
    c_skip, c_out = boundary_scalings(jnp.asarray([0, 500]))
    np.testing.assert_allclose(float(c_skip[0]), 1.0)
    np.testing.assert_allclose(float(c_out[0]), 0.0)
    assert float(c_skip[1]) < 1e-4 and float(c_out[1]) > 0.999


def test_student_initially_equals_teacher():
    """Zero-init LoRA-B: the student forward equals the teacher at init (up to XLA
    fusion-order rounding from the extra zero-adapter adds)."""
    dcfg = DistillConfig()
    params = _student_params(dcfg)
    batch = _batch()
    c = encode_text(params, CFG, batch["ids"], batch["mask"])
    cond = {"crossattn": c, "concat": batch["seg"]}
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 32 // CFG.vae.downscale, 32 // CFG.vae.downscale, 4))
    t = jnp.asarray([10, 900], jnp.int32)
    eps_student = apply_model(params, CFG, z, t, cond)
    eps_teacher = apply_model(teacher_view(params), CFG, z, t, cond)
    np.testing.assert_allclose(
        np.asarray(eps_student), np.asarray(eps_teacher), atol=1e-5
    )
    assert "unet_lora" not in teacher_view(params)


def _run_steps(dcfg, n_steps):
    params = _student_params(dcfg)
    part = ParamPartition(params, LABELERS["distill"])
    assert len(part.idx) > 0
    tx = optax.adam(1e-3)
    state = init_distill_state(params, tx, part)
    step = jax.jit(make_distill_step(CFG, SCHED, tx, part, dcfg))
    batch = _batch()
    losses = []
    for i in range(n_steps):
        state, m = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
    return state, losses


def test_guidance_distill_loss_decreases():
    # fixed batch + fixed rng (fold_in(step) varies t/noise); average halves should drop
    state, losses = _run_steps(DistillConfig(mode="guidance", guidance_scale=4.0), 24)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-8:]) < np.mean(losses[:8])
    assert int(state.step) == 24


def test_consistency_distill_runs_and_updates_ema():
    dcfg = DistillConfig(mode="consistency", teacher_steps=10, loss="huber")
    params = _student_params(dcfg)
    part = ParamPartition(params, LABELERS["distill"])
    tx = optax.adam(1e-3)
    state = init_distill_state(params, tx, part)
    ema0 = [np.asarray(e) for e in state.ema]
    step = jax.jit(make_distill_step(CFG, SCHED, tx, part, dcfg))
    batch = _batch()
    for _ in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))
    moved = any(
        not np.array_equal(a, np.asarray(b)) for a, b in zip(ema0, state.ema)
    )
    assert moved, "EMA leaves never updated"


def test_consistency_sample_shapes_and_single_step():
    dcfg = DistillConfig(mode="consistency")
    params = _student_params(dcfg)
    batch = _batch(1)
    c = encode_text(params, CFG, batch["ids"][:1], batch["mask"][:1])
    seg = jnp.zeros((1, 32, 32, 3))
    for steps in (1, 4):
        out = sample_consistency(params, CFG, SCHED, steps, jax.random.PRNGKey(0), seg, c)
        assert out.shape == (1, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_consistency_single_step_semantics():
    """1-step sampling must be exactly f(x_T, T−1): one model eval at the TOP timestep,
    boundary-scaled against the initial noise draw."""
    from topomap_tpu.core import make_schedule
    from topomap_tpu.core.consistency import consistency_fn, consistency_sample

    sched = make_schedule(1000)
    shape = (2, 8, 8, 4)

    # deterministic stand-in model; the expected value below is computed at t=999, whose
    # boundary scalings/alpha differ hugely from any other t — allclose proves the
    # single eval happened at the top of the trajectory
    def denoise(x, t, cond):
        return x * 0.1

    rng = jax.random.PRNGKey(42)
    out = consistency_sample(denoise, sched, 1, rng, shape, cond=None)
    _, init_rng = jax.random.split(rng)
    x_T = jax.random.normal(init_rng, shape, jnp.float32)
    t_b = jnp.full((2,), 999, jnp.int32)
    expect = consistency_fn(x_T, t_b, x_T * 0.1, sched.alphas_cumprod[999])
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-6)


def test_guidance_free_ddim_single_eval_path():
    """A guidance-distilled student samples through the standard DDIM scan at scale 1.0
    (single model call per step) — the drop-in deployment mode."""
    dcfg = DistillConfig(mode="guidance")
    params = _student_params(dcfg)
    batch = _batch(1)
    c = encode_text(params, CFG, batch["ids"][:1], batch["mask"][:1])
    seg = jnp.zeros((1, 32, 32, 3))
    out = sample(params, CFG, SCHED, DDIMConfig(3, guidance_scale=1.0),
                 jax.random.PRNGKey(0), seg, c)
    assert out.shape == (1, 32, 32, 3) and np.isfinite(np.asarray(out)).all()


def test_load_distill_preserves_task_lora(tmp_path):
    """_load_distill must fold a trained TASK LoRA into the trunk before attaching the
    student adapters — the student was distilled against the task-merged teacher
    (prepare_student), so dropping the task trees would sample the raw base."""
    import json

    from topomap_tpu.cli.main import _load_distill
    from topomap_tpu.lora import LoRASpec, build_lora_tree, merge_lora
    from topomap_tpu.utils.checkpoint import _flatten

    params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), CFG),
                                 jax.random.PRNGKey(1))
    # a "trained" task LoRA: randomize B so the delta is nonzero
    task = build_lora_tree(params["unet"], LoRASpec.qkv(2, 2), jax.random.PRNGKey(2))
    task = jax.tree.map(lambda x: jax.random.normal(jax.random.PRNGKey(3), x.shape) * 0.1,
                        task)
    params["unet_lora"] = task
    expect_unet = merge_lora(params["unet"], task)

    # a saved distill run whose student adapters are exact zeros (identity student)
    d = tmp_path / "distill"
    d.mkdir()
    spec = LoRASpec.qkvo(2)
    zero_u = jax.tree.map(jnp.zeros_like,
                          build_lora_tree(expect_unet, spec, jax.random.PRNGKey(4)))
    zero_c = jax.tree.map(jnp.zeros_like,
                          build_lora_tree(params["controlnet"], spec, jax.random.PRNGKey(5)))
    np.savez(d / "unet_lora_step5.npz", **_flatten(zero_u))
    np.savez(d / "ctrl_lora_step5.npz", **_flatten(zero_c))
    (d / "distill_meta.json").write_text(json.dumps(
        {"mode": "consistency", "rank": 2, "step": 5, "guidance_scale": 7.5}))

    merged, meta = _load_distill(d, params, CFG)
    assert meta["mode"] == "consistency"
    for a, b in zip(jax.tree.leaves(merged["unet"]), jax.tree.leaves(expect_unet)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
