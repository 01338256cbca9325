"""Tensor-parallel shardings on the 8-virtual-device CPU mesh.

Correctness contract: GSPMD execution over a (data, model) mesh with Megatron-style
weight shardings must be numerically equal (up to reduction order) to single-device
execution — no code change in the model, only sharding annotations. The reference has
no model parallelism at all (single ``device="cuda"``); this is the TPU latency axis."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from topomap_tpu.core import make_schedule
from topomap_tpu.parallel.tensor import (
    TP_AXIS,
    batch_sharding_dp,
    make_mesh_dp_tp,
    tp_spec_for,
    tp_specs,
    tp_shardings,
    shard_params_tp,
)
from topomap_tpu.pipeline import (
    PipelineConfig,
    apply_model,
    encode_text,
    init_pipeline,
    make_tokenizers,
    simulate_pretrained,
)

CFG = PipelineConfig.tiny()
SCHED = make_schedule(1000)


def _params():
    return simulate_pretrained(
        init_pipeline(jax.random.PRNGKey(0), CFG), jax.random.PRNGKey(1)
    )


def test_tp_spec_rules():
    assert tp_spec_for("unet/decoder/blocks/attn/blocks/attn1/to_q/w", 2) == P(None, TP_AXIS)
    assert tp_spec_for("controlnet/middle/attn/blocks/attn2/to_out/w", 2) == P(TP_AXIS, None)
    assert tp_spec_for("unet/encoder/blocks/attn/blocks/ff/proj_in/w", 2) == P(None, TP_AXIS)
    assert tp_spec_for("unet/encoder/blocks/attn/blocks/ff/proj_out/w", 2) == P(TP_AXIS, None)
    assert tp_spec_for("unet/encoder/blocks/res/in_conv/w", 4) == P(None, None, None, TP_AXIS)
    assert tp_spec_for("unet/encoder/blocks/res/emb/w", 2) == P(None, TP_AXIS)
    # norms, biases, non-trunk trees stay replicated
    assert tp_spec_for("unet/encoder/blocks/res/in_norm/scale", 1) == P()
    assert tp_spec_for("unet/encoder/blocks/attn/blocks/attn1/to_out/b", 1) == P()
    assert tp_spec_for("bert/layers/attn/q/w", 2) == P()
    assert tp_spec_for("vae/decoder/up/res/conv1/w", 4) == P()


def test_tp_specs_cover_trunk():
    params = _params()
    specs = tp_specs(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    sharded = [p for p, s in flat if s != P()]
    names = {"/".join(str(getattr(k, "key", "")) for k in p) for p in sharded}
    assert any("to_q" in n for n in names)
    assert any("proj_in" in n for n in names)
    assert all(n.startswith(("unet", "controlnet")) for n in names), sorted(names)[:5]


def test_tp_apply_model_matches_single_device():
    """eps(z,t,c) through the dp=2 x tp=4 sharded trunk == single-device eps."""
    params = _params()
    b = 4
    z = np.random.default_rng(0).standard_normal((b, 16, 16, 4)).astype(np.float32)
    t = np.full((b,), 500, np.int32)
    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Set Forest color to dark green"] * b)
    ctx = np.asarray(encode_text(params, CFG, jnp.asarray(ids), jnp.asarray(mask)))
    seg = np.random.default_rng(1).random((b, 32, 32, 3), np.float32)

    def eps(p, z, t, ctx, seg):
        return apply_model(p, CFG, z, t, {"crossattn": ctx, "concat": seg})

    ref = jax.jit(eps)(params, z, t, ctx, seg)

    mesh = make_mesh_dp_tp(2, 4)
    p_sh = shard_params_tp(mesh, params)
    dsh = batch_sharding_dp(mesh)
    args = tuple(jax.device_put(x, dsh) for x in (z, t, ctx, seg))
    got = jax.jit(eps, in_shardings=(tp_shardings(mesh, params), dsh, dsh, dsh, dsh))(
        p_sh, *args
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_tp_train_step_matches_single_device():
    from topomap_tpu.train.optim import OptimConfig, build_optimizer
    from topomap_tpu.train.trainer import init_train_state, make_train_step

    params = _params()
    tx, part = build_optimizer(params, OptimConfig("config3", total_steps=100, warmup=5))
    step_fn = make_train_step(CFG, SCHED, tx, part, "config3")
    state = init_train_state(params, tx, part)

    tok, _ = make_tokenizers(CFG)
    b = 8
    ids, mask = tok.encode(["Set Forest color to dark green"] * b)
    batch = {
        "seg": np.random.default_rng(0).random((b, 32, 32, 3)).astype(np.float32),
        "gt": (np.random.default_rng(1).random((b, 32, 32, 3)).astype(np.float32) * 2 - 1),
        "ids": np.asarray(ids),
        "mask": np.asarray(mask),
    }
    rng = jax.random.PRNGKey(7)
    s1, m1 = jax.jit(step_fn)(state, jax.tree.map(jnp.asarray, batch), rng)

    mesh = make_mesh_dp_tp(2, 4)
    state_sh = shard_params_tp(mesh, state)  # params+opt state: trunk sharded, rest replicated
    dsh = batch_sharding_dp(mesh)
    batch_sh = jax.tree.map(lambda x: jax.device_put(x, dsh), batch)
    s2, m2 = jax.jit(step_fn)(state_sh, batch_sh, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for x, y in zip(jax.tree.leaves(s1.params["adapter"]), jax.tree.leaves(s2.params["adapter"])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_tp_cost_analysis_splits_flops():
    """Pure-TP scaling evidence: at FIXED batch, per-device FLOPs of the eps forward drop
    when the trunk is sharded over the model axis (the point of TP is latency: the same
    tile's work is split). All-gathers add traffic, so the split is not perfectly 1/tp —
    assert a material drop instead."""
    params = _params()
    b = 2
    z = np.zeros((b, 16, 16, 4), np.float32)
    t = np.zeros((b,), np.int32)
    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["x"] * b)
    ctx = np.asarray(encode_text(params, CFG, jnp.asarray(ids), jnp.asarray(mask)))
    seg = np.zeros((b, 32, 32, 3), np.float32)

    def eps(p, z, t, ctx, seg):
        return apply_model(p, CFG, z, t, {"crossattn": ctx, "concat": seg})

    def flops(n_tp):
        mesh = make_mesh_dp_tp(1, n_tp)
        rep = NamedSharding(mesh, P())
        compiled = (
            jax.jit(
                eps,
                in_shardings=(tp_shardings(mesh, params), rep, rep, rep, rep),
            )
            .lower(params, z, t, ctx, seg)
            .compile()
        )
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        return float(cost.get("flops", 0.0))

    f1, f8 = flops(1), flops(8)
    assert f1 > 0
    assert f8 < 0.55 * f1, (f1, f8, "model-axis sharding did not split per-device FLOPs")
