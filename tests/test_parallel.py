"""Mesh/sharding tests on the 8-virtual-device CPU backend."""
import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.core import make_schedule
from topomap_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)
from topomap_tpu.parallel.sheet import stylize_sheet_sharded
from topomap_tpu.pipeline import (
    PipelineConfig,
    encode_text,
    init_pipeline,
    make_tokenizers,
    simulate_pretrained,
)

CFG = PipelineConfig.tiny()
SCHED = make_schedule(1000)


def test_mesh_and_shard_batch():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    batch = {"x": np.zeros((16, 4), np.float32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    rep = replicate(mesh, {"w": np.ones(3, np.float32)})
    assert rep["w"].sharding.spec == jax.sharding.PartitionSpec()


def test_pad_to_multiple():
    batch = {"x": np.arange(10, dtype=np.float32).reshape(10, 1)}
    padded, n = pad_to_multiple(batch, 8)
    assert n == 10 and padded["x"].shape == (16, 1)
    np.testing.assert_array_equal(padded["x"][10:], padded["x"][9:10].repeat(6, 0))


def test_sharded_training_step_matches_single_device():
    """The pjit data-parallel step must produce the same loss as unsharded execution."""
    from topomap_tpu.train.optim import OptimConfig, build_optimizer
    from topomap_tpu.train.trainer import init_train_state, make_train_step

    params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), CFG), jax.random.PRNGKey(1))
    tx, part = build_optimizer(params, OptimConfig("config3", total_steps=100, warmup=5))
    step_fn = make_train_step(CFG, SCHED, tx, part, "config3")
    state = init_train_state(params, tx, part)

    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Set Forest color to dark green"] * 8)
    batch = {
        "seg": np.random.default_rng(0).random((8, 32, 32, 3)).astype(np.float32),
        "gt": (np.random.default_rng(1).random((8, 32, 32, 3)).astype(np.float32) * 2 - 1),
        "ids": ids,
        "mask": mask,
    }
    rng = jax.random.PRNGKey(7)

    # single-device
    s1, m1 = jax.jit(step_fn)(state, jax.tree.map(jnp.asarray, batch), rng)

    # sharded
    mesh = make_mesh()
    state_sh = replicate(mesh, state)
    batch_sh = shard_batch(mesh, batch)
    s2, m2 = jax.jit(step_fn)(state_sh, batch_sh, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    # updated trainable params agree
    a = jax.tree.leaves(s1.params["adapter"])
    b = jax.tree.leaves(s2.params["adapter"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_sharded_distill_step_matches_single_device():
    """Guidance distillation is data-parallel like the train step: same loss sharded
    over the 8-device mesh as unsharded."""
    from topomap_tpu.train.distill import (
        DistillConfig,
        init_distill_state,
        make_distill_step,
        prepare_student,
    )
    from topomap_tpu.train.optim import OptimConfig, build_optimizer

    params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), CFG), jax.random.PRNGKey(1))
    dcfg = DistillConfig(mode="guidance", guidance_scale=4.0)
    params = prepare_student(params, CFG, dcfg, jax.random.PRNGKey(2))
    tx, part = build_optimizer(params, OptimConfig("distill", total_steps=100, warmup=5))
    state = init_distill_state(params, tx, part)
    step_fn = make_distill_step(CFG, SCHED, tx, part, dcfg)

    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Set Forest color to dark green"] * 8)
    batch = {
        "seg": np.random.default_rng(0).random((8, 32, 32, 3)).astype(np.float32),
        "gt": (np.random.default_rng(1).random((8, 32, 32, 3)).astype(np.float32) * 2 - 1),
        "ids": ids,
        "mask": mask,
    }
    rng = jax.random.PRNGKey(7)

    s1, m1 = jax.jit(step_fn)(state, jax.tree.map(jnp.asarray, batch), rng)

    mesh = make_mesh()
    state_sh = replicate(mesh, state)
    batch_sh = shard_batch(mesh, batch)
    s2, m2 = jax.jit(step_fn)(state_sh, batch_sh, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)


def test_stylize_sheet_sharded_cpu_mesh():
    params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), CFG), jax.random.PRNGKey(1))
    mesh = make_mesh()
    from topomap_tpu.data.synthetic import generate_seg_tile

    # 2x3 grid of 32px tiles = 6 tiles (pads to 8 on the mesh)
    sheet = np.concatenate(
        [np.concatenate([generate_seg_tile(i * 3 + j)[:32, :32] for j in range(3)], axis=1)
         for i in range(2)],
        axis=0,
    )
    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Set Lake color to turquoise"])
    ctx = encode_text(params, CFG, jnp.asarray(ids), jnp.asarray(mask))
    out = stylize_sheet_sharded(params, CFG, SCHED, mesh, sheet, ctx, tile=32, steps=2)
    assert out.shape == (64, 96, 3) and out.dtype == np.uint8


def test_two_level_mesh_training_step():
    """(dcn, data) 2x4 mesh: batch sharded over BOTH axes; loss matches 1-device run."""
    from topomap_tpu.parallel.mesh import batch_sharding_2d, make_mesh_2d
    from topomap_tpu.train.optim import OptimConfig, build_optimizer
    from topomap_tpu.train.trainer import init_train_state, make_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), CFG), jax.random.PRNGKey(1))
    tx, part = build_optimizer(params, OptimConfig("config3", total_steps=100, warmup=5))
    step_fn = make_train_step(CFG, SCHED, tx, part, "config3")
    state = init_train_state(params, tx, part)

    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Set Forest color to dark green"] * 8)
    batch = {
        "seg": np.random.default_rng(0).random((8, 32, 32, 3)).astype(np.float32),
        "gt": (np.random.default_rng(1).random((8, 32, 32, 3)).astype(np.float32) * 2 - 1),
        "ids": ids,
        "mask": mask,
    }
    rng = jax.random.PRNGKey(7)
    s1, m1 = jax.jit(step_fn)(state, jax.tree.map(jnp.asarray, batch), rng)

    mesh = make_mesh_2d(2, 4)
    assert mesh.devices.shape == (2, 4)
    sh = batch_sharding_2d(mesh)
    rep = NamedSharding(mesh, P())
    state_sh = jax.tree.map(lambda x: jax.device_put(x, rep), state)
    batch_sh = jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    s2, m2 = jax.jit(step_fn)(state_sh, batch_sh, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)


def test_dp_scaling_cost_analysis():
    """Scaling evidence on the virtual mesh (predicted curve for the first real
    multi-chip run): the compiled DP train step's per-device FLOPs scale ~1/n with
    mesh size at fixed GLOBAL batch (no replicated-compute blowup), and cross-device
    traffic stays at the gradient all-reduce level (bounded by ~2x trainable bytes)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from topomap_tpu.train.optim import OptimConfig, build_optimizer
    from topomap_tpu.train.trainer import init_train_state, make_train_step

    params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), CFG), jax.random.PRNGKey(1))
    tx, part = build_optimizer(params, OptimConfig("config3", total_steps=100, warmup=5))
    step_fn = make_train_step(CFG, SCHED, tx, part, "config3")
    state = init_train_state(params, tx, part)

    tok, _ = make_tokenizers(CFG)
    b = 8  # global batch, fixed across mesh sizes
    ids, mask = tok.encode(["Set Forest color to dark green"] * b)
    batch = {
        "seg": np.random.default_rng(0).random((b, 32, 32, 3)).astype(np.float32),
        "gt": (np.random.default_rng(1).random((b, 32, 32, 3)).astype(np.float32) * 2 - 1),
        "ids": np.asarray(ids),
        "mask": np.asarray(mask),
    }

    flops_by_n = {}
    bytes_by_n = {}
    for n in (1, 2, 8):
        mesh = make_mesh(n)
        compiled = (
            jax.jit(
                step_fn,
                in_shardings=(
                    jax.tree.map(lambda _: NamedSharding(mesh, P()), state),
                    jax.tree.map(lambda _: NamedSharding(mesh, P("data")), batch),
                    NamedSharding(mesh, P()),
                ),
            )
            .lower(state, batch, jax.random.PRNGKey(7))
            .compile()
        )
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops_by_n[n] = float(cost.get("flops", 0.0))
        # XLA reports cross-replica traffic under "bytes accessed" operand keys; use
        # the collective-bytes entry when present, else fall back to utilization-free 0
        bytes_by_n[n] = float(cost.get("bytes accessed", 0.0))

    assert flops_by_n[1] > 0
    # cost_analysis is per-device (per-program) FLOPs under SPMD partitioning
    r2 = flops_by_n[1] / flops_by_n[2]
    r8 = flops_by_n[1] / flops_by_n[8]
    assert 1.6 < r2 < 2.4, (flops_by_n, "n=2 per-device flops not ~halved")
    assert 5.0 < r8 < 11.0, (flops_by_n, "n=8 per-device flops not ~1/8")
