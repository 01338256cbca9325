"""Trainability regimes beyond configs 1-3: bert-last-layer, pooler, clip-ft, staged,
embfussion; LPIPS-loss train step; observability/inspect utilities."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topomap_tpu.core import make_schedule
from topomap_tpu.pipeline import PipelineConfig, encode_text, init_pipeline, simulate_pretrained
from topomap_tpu.train.optim import (
    LABELERS,
    OptimConfig,
    build_optimizer,
    count_trainable,
    label_params,
)
from topomap_tpu.train.trainer import init_train_state, make_train_step
from topomap_tpu.utils.inspect_tools import assert_frozen, audit_checkpoint, count_params, summarize_params
from topomap_tpu.utils.observability import StepTimer, check_finite, finite_or_skip_update


def _labels_set(params, name):
    labels = label_params(params, LABELERS[name])
    return set(jax.tree.leaves(labels))


def test_bert_last_layer_regime_targets_only_last_ffn():
    cfg = PipelineConfig.tiny()
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    labels = label_params(params, LABELERS["bert_last_layer"])
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    from topomap_tpu.train.optim import _path_str

    bert_ft = [(_path_str(p)) for p, l in flat if l == "bert_ft"]
    n_layers = len(params["bert"]["layers"])
    assert bert_ft, "no bert_ft leaves"
    for p in bert_ft:
        assert p.startswith(f"bert/layers/{n_layers - 1}/")
        assert "/mlp/" in p or "/ln2/" in p
    # earlier layers frozen
    assert all(not p.startswith("bert/layers/0/") for p in bert_ft)


def test_clip_ft_regime_last_two_layers():
    cfg = PipelineConfig.tiny(with_clip=True)
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    labels = label_params(params, LABELERS["clip_ft"])
    from topomap_tpu.train.optim import _path_str

    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    clip_ft = [(_path_str(p)) for p, l in flat if l == "clip_ft"]
    n = len(params["clip"]["layers"])
    assert clip_ft
    for p in clip_ft:
        assert p.startswith("clip/final_ln/") or any(
            p.startswith(f"clip/layers/{i}/") for i in (n - 1, n - 2)
        )


def test_q_only_staged_regime():
    cfg = PipelineConfig.tiny()
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    labels = label_params(params, LABELERS["q_only"])
    from topomap_tpu.train.optim import _path_str

    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    active = [(_path_str(p)) for p, l in flat if l != "frozen"]
    assert active and all("/to_q/" in p for p in active)


def test_pooler_mode_pipeline_and_regime():
    cfg = dataclasses.replace(PipelineConfig.tiny(), text_mode="pooler")
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    assert "pooler" in params
    ids = jnp.zeros((1, 10), jnp.int32)
    mask = jnp.ones((1, 10), jnp.int32)
    c = encode_text(params, cfg, ids, mask)
    assert c.shape == (1, 10, cfg.bert.hidden)
    n = count_trainable(params, LABELERS["pooler"])
    assert n == count_params(params["pooler"]) + count_params(params["unet_lora"])


def test_embfussion_mode_has_fusion_collection():
    cfg = dataclasses.replace(PipelineConfig.tiny(with_clip=True), text_mode="embfussion")
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    assert "fusion" in params
    assert "embfussion" in LABELERS
    labels = _labels_set(params, "embfussion")
    assert "fusion" in labels


def test_lpips_train_step_runs_and_updates():
    from topomap_tpu.train.losses import lpips_init

    cfg = PipelineConfig.tiny()
    sched = make_schedule(1000)
    params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), cfg), jax.random.PRNGKey(1))
    tx, part = build_optimizer(params, OptimConfig("config3", total_steps=50, warmup=5))
    lp = lpips_init(jax.random.PRNGKey(5), width_mult=0.05)
    step = jax.jit(
        make_train_step(cfg, sched, tx, part, "config3", use_lpips=True, lpips_params=lp)
    )
    state = init_train_state(params, tx, part)
    batch = {
        "seg": jnp.zeros((1, 32, 32, 3)),
        "gt": jnp.zeros((1, 32, 32, 3)),
        "ids": jnp.zeros((1, 8), jnp.int32),
        "mask": jnp.ones((1, 8), jnp.int32),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert "lpips" in metrics and np.isfinite(float(metrics["loss"]))


def test_check_finite_and_skip_update():
    good = {"a": jnp.ones(3)}
    check_finite(good)
    bad = {"a": jnp.asarray([1.0, jnp.nan, 2.0])}
    with pytest.raises(FloatingPointError):
        check_finite(bad, "bad")
    upd = {"w": jnp.asarray([jnp.inf, 1.0])}
    out = finite_or_skip_update(upd, {"w": jnp.zeros(2)})
    np.testing.assert_array_equal(np.asarray(out["w"]), 0.0)
    out2 = finite_or_skip_update({"w": jnp.ones(2)}, {"w": jnp.zeros(2)})
    np.testing.assert_array_equal(np.asarray(out2["w"]), 1.0)


def test_step_timer_and_inspect_tools():
    import time

    t = StepTimer(warmup_steps=1)
    for _ in range(3):
        with t:
            time.sleep(0.01)
    assert 0 < t.steps_per_sec < 1000
    assert t.items_per_sec(4) == 4 * t.steps_per_sec

    sd = {"model.diffusion_model.x": np.zeros(4), "control_model.y": np.zeros(2)}
    audit = audit_checkpoint(sd)
    assert audit["has_controlnet"] and audit["num_keys"] == 2 and audit["total_params"] == 6

    cfg = PipelineConfig.tiny()
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    summary = summarize_params(params, max_depth=1)
    assert "unet" in summary and "params" in summary

    assert_frozen(params["vae"], params["vae"])
    changed = jax.tree.map(lambda x: x + 1, params["vae"])
    with pytest.raises(AssertionError):
        assert_frozen(params["vae"], changed, "vae")


def test_throughput_report_intervals(tmp_path):
    """tools/throughput_report.py: steady-state rate + phase shares from v2 bucket rows;
    relaunch intervals (counter resets, huge untracked time) must not pollute them."""
    import json
    import sys

    sys.path.insert(0, "tools")
    try:
        from throughput_report import intervals, report
    finally:
        sys.path.pop(0)

    def row(step, t, dw, dp, vc):
        return {"v": 2, "step": step, "time": t, "steps_per_sec": 1.0,
                "tiles_per_sec": 2.0, "data_wait_s": dw, "dispatch_s": dp, "val_ckpt_s": vc}

    rows = [
        row(200, 100.0, 1.0, 8.0, 0.0),
        row(400, 200.0, 11.0, 88.0, 0.0),     # steady: 2 steps/s, 88% dispatch
        row(600, 1000.0, 12.0, 98.0, 10.0),   # relaunch gap: 780 s untracked -> excluded
        row(800, 1100.0, 22.0, 188.0, 10.0),  # steady again
        row(1000, 1150.0, 2.0, 3.0, 0.0),     # counters reset (relaunch) -> dropped
    ]
    ivs = intervals(rows)
    assert len(ivs) == 3  # the counter-reset pair is dropped entirely
    p = tmp_path / "throughput.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    rep = report(tmp_path)
    assert rep["steady_intervals"] == 2
    assert abs(rep["steady_steps_per_sec_median"] - 2.0) < 1e-6
    assert abs(rep["share"]["dispatch_s"] - (80 + 90) / 200) < 1e-6
    assert rep["dispatch_only_steps_per_sec"] is not None
