"""CLI end-to-end on the tiny preset + orbax/filtered checkpoint roundtrips."""
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.cli.main import main as cli_main
from topomap_tpu.configs.presets import PRESETS, get_preset
from topomap_tpu.pipeline import PipelineConfig, init_pipeline
from topomap_tpu.train.optim import build_optimizer, config2_labeler
from topomap_tpu.train.trainer import init_train_state
from topomap_tpu.utils.checkpoint import (
    load_filtered,
    restore_latest,
    save_filtered,
    save_train_state,
)


def test_presets_construct():
    for name in PRESETS:
        p = get_preset(name)
        assert p.name == name and p.steps > 0
    c3 = get_preset("config3_addlrSD")
    assert c3.pipeline.unet_lora is not None and c3.optim.config_name == "config3"
    assert get_preset("config3_maskloss").use_maskloss


def test_orbax_roundtrip(tmp_path):
    cfg = PipelineConfig.tiny()
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    preset = get_preset("tiny_smoke")
    tx, part = build_optimizer(params, preset.optim)
    state = init_train_state(params, tx, part)
    state = dataclasses.replace(state, step=jnp.asarray(7, jnp.int32))
    save_train_state(tmp_path / "ckpt", state, 7)

    blank = init_train_state(init_pipeline(jax.random.PRNGKey(9), cfg), tx, part)
    restored, step = restore_latest(tmp_path / "ckpt", blank)
    assert step == 7 and int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_latest_empty_dir(tmp_path):
    cfg = PipelineConfig.tiny()
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    tx, part = build_optimizer(params, get_preset("tiny_smoke").optim)
    state = init_train_state(params, tx, part)
    _, step = restore_latest(tmp_path / "none", state)
    assert step == 0


def test_filtered_save_load(tmp_path):
    cfg = PipelineConfig.tiny()
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    written = save_filtered(tmp_path, params, 5, labeler=config2_labeler)
    names = {p.name for p in written}
    assert {"adapter_step5.npz", "ctrl_lora_step5.npz", "unet_lora_step5.npz",
            "controlnet_ft_step5.npz"} <= names
    # overlay onto fresh params
    other = init_pipeline(jax.random.PRNGKey(1), cfg)
    merged = load_filtered(other, tmp_path / "adapter_step5.npz", "adapter")
    np.testing.assert_array_equal(
        np.asarray(merged["adapter"]["out"]["w"]), np.asarray(params["adapter"]["out"]["w"])
    )
    # other collections untouched
    np.testing.assert_array_equal(
        np.asarray(merged["unet"]["out_conv"]["w"]), np.asarray(other["unet"]["out_conv"]["w"])
    )


def test_cli_train_maskloss_synthetic_palette(tmp_path):
    """Drives the in-graph maskloss path (x0 decode + masked color loss, synthetic seg
    palette) end-to-end through the CLI — the prompt_adherence phase-2 step in CI size."""
    data_dir = tmp_path / "data"
    cli_main(["make-data", "--out", str(data_dir), "--tiles", "2"])
    run_dir = tmp_path / "run"
    cli_main([
        "train", "--preset", "tiny_maskloss", "--data", str(data_dir / "pairs.jsonl"),
        "--out", str(run_dir), "--steps", "4", "--size", "32", "--log-every", "2",
    ])
    log = json.loads((run_dir / "loss_log.json").read_text())
    assert len(log["step"]) == 4
    assert all(np.isfinite(v) for v in log["train_mse"])


def test_cli_train_resume(tmp_path, capsys):
    """Auto-resume through the CLI: a second ``train`` over the same --out picks up from
    the newest Orbax step and trains to the new total. Covers the host-side restore
    (restore_latest to_host=True) that keeps resume at fresh-run HBM levels — the
    on-device-template restore OOM'd the v5e mid round 3."""
    data_dir = tmp_path / "data"
    cli_main(["make-data", "--out", str(data_dir), "--tiles", "2"])
    run_dir = tmp_path / "run"
    base = [
        "train", "--preset", "tiny_smoke", "--data", str(data_dir / "pairs.jsonl"),
        "--out", str(run_dir), "--size", "32", "--log-every", "2",
    ]
    cli_main(base + ["--steps", "4"])
    capsys.readouterr()
    cli_main(base + ["--steps", "8", "--scan-steps", "2"])
    out = capsys.readouterr().out
    assert "resumed from step 4" in out
    log = json.loads((run_dir / "loss_log.json").read_text())
    assert log["step"][-1] == 8
    assert all(np.isfinite(v) for v in log["train_mse"])


def test_save_filtered_retention(tmp_path):
    """keep_last retention (ADVICE r3): older per-step filtered snapshots are deleted."""
    cfg = PipelineConfig.tiny()
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    for step in (1, 2, 3, 4):
        save_filtered(tmp_path, params, step, keep_last=2)
    steps_left = sorted({int(p.name.split("_step")[1].split(".")[0])
                         for p in tmp_path.glob("*_step*.npz")})
    assert steps_left == [3, 4]
    # keep_last=0 disables cleanup
    save_filtered(tmp_path, params, 5, keep_last=0)
    steps_left = sorted({int(p.name.split("_step")[1].split(".")[0])
                         for p in tmp_path.glob("*_step*.npz")})
    assert steps_left == [3, 4, 5]


def test_restore_from_filtered_disaster_recovery(tmp_path):
    """Container resets wipe the (uncommitted) Orbax dir but keep the committed filtered
    npz: restore_from_filtered must rebuild the full trainable state — including the
    labeler-filtered controlnet ctrl_ft subset — and set state.step."""
    from topomap_tpu.utils.checkpoint import restore_from_filtered

    cfg = PipelineConfig.tiny()
    trained = init_pipeline(jax.random.PRNGKey(0), cfg)
    save_filtered(tmp_path, trained, 40, labeler=config2_labeler)
    save_filtered(tmp_path, trained, 50, labeler=config2_labeler)

    fresh = init_pipeline(jax.random.PRNGKey(9), cfg)
    tx, part = build_optimizer(fresh, get_preset("tiny_smoke").optim)
    state = init_train_state(fresh, tx, part)
    state, step = restore_from_filtered(tmp_path, state)
    assert step == 50 and int(state.step) == 50
    # every saved trainable collection matches the trained tree
    for coll in ("adapter", "ctrl_lora", "unet_lora"):
        for a, b in zip(jax.tree.leaves(state.params[coll]), jax.tree.leaves(trained[coll])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ctrl_ft subset overlaid onto the controlnet collection
    cn_flat = dict(np.load(tmp_path / "controlnet_ft_step50.npz"))
    assert cn_flat
    got = {k: v for k, v in _flatten_tree(state.params["controlnet"]).items() if k in cn_flat}
    for k in cn_flat:
        np.testing.assert_array_equal(got[k], cn_flat[k])
    # frozen base stays the fresh init (only trainables restored)
    a0 = jax.tree.leaves(state.params["unet"])[0]
    b0 = jax.tree.leaves(fresh["unet"])[0]
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(b0))
    # empty dir: untouched
    _, step0 = restore_from_filtered(tmp_path / "none", state)
    assert step0 == 0


def _flatten_tree(tree, prefix=""):
    from topomap_tpu.utils.checkpoint import _flatten

    return _flatten(tree)


def test_cli_distill_resume(tmp_path, capsys):
    """cmd_distill auto-resume (chip-chain idempotency): a second invocation over the same
    --out picks up from the newest student snapshot instead of restarting at step 0."""
    data_dir = tmp_path / "data"
    cli_main(["make-data", "--out", str(data_dir), "--tiles", "2"])
    out_dir = tmp_path / "distill"
    base = [
        "distill", "--preset", "tiny_smoke", "--data", str(data_dir / "pairs.jsonl"),
        "--out", str(out_dir), "--mode", "consistency", "--size", "32", "--rank", "2",
        "--teacher-steps", "4", "--save-every", "2", "--log-every", "2",
    ]
    cli_main(base + ["--steps", "4"])
    assert (out_dir / "unet_lora_step4.npz").exists()
    capsys.readouterr()
    cli_main(base + ["--steps", "6"])
    out = capsys.readouterr().out
    assert "resumed from step 4" in out
    assert (out_dir / "unet_lora_step6.npz").exists()
    log = json.loads((out_dir / "loss_log.json").read_text())
    assert log["step"] == list(range(1, 7))  # no duplicate rows from the resume


def test_filtered_load_fp16_upcasts(tmp_path):
    """Committed interchange artifacts may be fp16 (half the repo cost); the overlay load
    must upcast to the template's compute dtype so downstream matmuls stay fp32."""
    cfg = PipelineConfig.tiny()
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    save_filtered(tmp_path, params, 5)
    flat = dict(np.load(tmp_path / "adapter_step5.npz"))
    np.savez(tmp_path / "adapter_fp16.npz",
             **{k: v.astype(np.float16) for k, v in flat.items()})
    other = init_pipeline(jax.random.PRNGKey(1), cfg)
    merged = load_filtered(other, tmp_path / "adapter_fp16.npz", "adapter")
    got = np.asarray(merged["adapter"]["out"]["w"])
    assert got.dtype == np.asarray(other["adapter"]["out"]["w"]).dtype
    np.testing.assert_allclose(
        got, np.asarray(params["adapter"]["out"]["w"]), atol=1e-3, rtol=1e-2
    )


def test_cli_make_data_train_sample_evaluate(tmp_path):
    data_dir = tmp_path / "data"
    cli_main(["make-data", "--out", str(data_dir), "--tiles", "2"])
    assert (data_dir / "pairs.jsonl").exists()

    run_dir = tmp_path / "run"
    cli_main([
        "train", "--preset", "tiny_smoke", "--data", str(data_dir / "pairs.jsonl"),
        "--out", str(run_dir), "--steps", "6", "--size", "32", "--log-every", "2",
    ])
    log = json.loads((run_dir / "loss_log.json").read_text())
    assert len(log["step"]) == 6
    assert (run_dir / "ckpt").exists()

    seg_png = next((data_dir / "source").glob("*.png"))
    out_png = tmp_path / "out.png"
    cli_main([
        "sample", "--preset", "tiny_smoke", "--ckpt", str(run_dir),
        "--prompt", "Set Forest color to dark green", "--seg", str(seg_png),
        "--out", str(out_png), "--size", "32", "--ddim-steps", "2",
    ])
    assert out_png.exists()

    metrics_json = tmp_path / "metrics.json"
    cli_main([
        "evaluate", "--preset", "tiny_smoke", "--ckpt", str(run_dir),
        "--data", str(data_dir / "pairs.jsonl"), "--per-prompt", "1",
        "--size", "32", "--ddim-steps", "2", "--out", str(metrics_json),
    ])
    res = json.loads(metrics_json.read_text())
    assert "means" in res and res["rows"]


def test_cli_stylize_sheet(tmp_path):
    from PIL import Image

    from topomap_tpu.data.synthetic import generate_seg_tile

    sheet = np.concatenate(
        [np.concatenate([generate_seg_tile(i * 2 + j)[:32, :32] for j in range(2)], axis=1)
         for i in range(2)],
        axis=0,
    )  # 64x64 = 2x2 tiles of 32
    sheet_png = tmp_path / "sheet.png"
    Image.fromarray(sheet).save(sheet_png)
    out_png = tmp_path / "styled.png"
    cli_main([
        "stylize-sheet", "--preset", "tiny_smoke", "--sheet", str(sheet_png),
        "--prompt", "Set Lake color to navy blue", "--out", str(out_png),
        "--size", "32", "--ddim-steps", "2", "--batch-tiles", "2",
    ])
    out = np.array(Image.open(out_png))
    assert out.shape == (64, 64, 3)


def test_cli_grid(tmp_path):
    data_dir = tmp_path / "data"
    cli_main(["make-data", "--out", str(data_dir), "--tiles", "2"])
    out_png = tmp_path / "grid.png"
    cli_main([
        "grid", "--preset", "tiny_smoke", "--data", str(data_dir / "pairs.jsonl"),
        "--n", "2", "--size", "32", "--ddim-steps", "2", "--out", str(out_png),
    ])
    assert out_png.exists()


def test_cli_best_of_n(tmp_path):
    data_dir = tmp_path / "data"
    cli_main(["make-data", "--out", str(data_dir), "--tiles", "1"])
    seg_png = next((data_dir / "source").glob("*.png"))
    out_png = tmp_path / "best.png"
    cli_main([
        "best-of-n", "--preset", "tiny_smoke", "--prompt", "Set Lake color to navy blue",
        "--seg", str(seg_png), "--n", "2", "--size", "32", "--ddim-steps", "2",
        "--out", str(out_png),
    ])
    assert out_png.exists()
    report = json.loads(out_png.with_suffix(".report.json").read_text())
    assert report["picked"] in (0, 1) and len(report["miou"]) == 2


def test_cli_compare_runs(tmp_path):
    data_dir = tmp_path / "data"
    cli_main(["make-data", "--out", str(data_dir), "--tiles", "2"])
    runs = []
    for name in ("a", "b"):
        run_dir = tmp_path / name
        cli_main([
            "train", "--preset", "tiny_smoke", "--data", str(data_dir / "pairs.jsonl"),
            "--out", str(run_dir), "--steps", "2", "--size", "32", "--log-every", "2",
        ])
        assert list((run_dir / "filtered").glob("*_step2.npz"))
        runs.append(run_dir)
    out_png = tmp_path / "cmp.png"
    cli_main([
        "compare-runs", "--preset", "tiny_smoke", "--data", str(data_dir / "pairs.jsonl"),
        "--runs", f"A={runs[0]/'filtered'}:2", f"B={runs[1]/'filtered'}:2",
        "--n", "2", "--size", "32", "--ddim-steps", "2", "--out", str(out_png),
    ])
    assert out_png.exists()


def test_async_checkpoint_roundtrip(tmp_path):
    """save wait=False + wait_for_checkpoints == durable checkpoint."""
    from topomap_tpu.utils.checkpoint import wait_for_checkpoints

    cfg = PipelineConfig.tiny()
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    preset = get_preset("tiny_smoke")
    tx, part = build_optimizer(params, preset.optim)
    state = init_train_state(params, tx, part)
    state = dataclasses.replace(state, step=jnp.asarray(3, jnp.int32))
    save_train_state(tmp_path / "ckpt", state, 3, wait=False)
    wait_for_checkpoints(tmp_path / "ckpt")
    blank = init_train_state(init_pipeline(jax.random.PRNGKey(9), cfg), tx, part)
    restored, step = restore_latest(tmp_path / "ckpt", blank)
    assert step == 3
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_base_npz_roundtrip_and_restore(tmp_path):
    """save_base_npz -> load_base_npz/restore_from_base_npz: the full-trunk interchange
    artifact (fp16, one file, unet+controlnet+adapter+bert) round-trips to fp16
    precision and sets the resumed step."""
    import dataclasses

    from topomap_tpu.train.optim import build_optimizer
    from topomap_tpu.utils.checkpoint import (
        load_base_npz,
        restore_from_base_npz,
        save_base_npz,
    )

    cfg = PipelineConfig.tiny()
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    path = save_base_npz(tmp_path, params, 120)
    assert path.name == "base_step120.npz" and path.stat().st_size > 0

    other = init_pipeline(jax.random.PRNGKey(9), cfg)
    merged = load_base_npz(other, path)
    for coll in ("unet", "controlnet", "adapter", "bert"):
        a = np.asarray(jax.tree.leaves(merged[coll])[0])
        b = np.asarray(jax.tree.leaves(params[coll])[0])
        np.testing.assert_allclose(a, b, atol=1e-3)  # fp16 interchange
        assert a.dtype == np.float32  # upcast on load
    # frozen/other collections untouched
    np.testing.assert_array_equal(
        np.asarray(merged["vae"]["encoder"]["conv_in"]["w"]),
        np.asarray(other["vae"]["encoder"]["conv_in"]["w"]),
    )

    preset = get_preset("tiny_base")
    tx, part = build_optimizer(other, preset.optim)
    state = init_train_state(other, tx, part)
    state, step = restore_from_base_npz(tmp_path, state)
    assert step == 120 and int(state.step) == 120

    # retention: newer save deletes the older file (keep_last=1)
    save_base_npz(tmp_path, params, 200)
    assert not (tmp_path / "base_step120.npz").exists()
    assert (tmp_path / "base_step200.npz").exists()


def test_restore_from_filtered_skips_incomplete_step(tmp_path):
    """A torn snapshot (reset mid-save: step N has only SOME collections) must not win
    over the newest complete step (ADVICE r4 medium)."""
    from topomap_tpu.train.optim import build_optimizer
    from topomap_tpu.utils.checkpoint import restore_from_filtered

    cfg = PipelineConfig.tiny()
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    save_filtered(tmp_path, params, 40, labeler=config2_labeler, keep_last=0)
    save_filtered(tmp_path, params, 50, labeler=config2_labeler, keep_last=0)
    # simulate the torn step-50 write: drop two of its collections
    (tmp_path / "unet_lora_step50.npz").unlink()
    (tmp_path / "controlnet_ft_step50.npz").unlink()

    preset = get_preset("tiny_smoke")
    tx, part = build_optimizer(params, preset.optim)
    state = init_train_state(init_pipeline(jax.random.PRNGKey(3), cfg), tx, part)
    _, step = restore_from_filtered(tmp_path, state)
    assert step == 40


def test_full_labeler_trains_trunk_and_bert_freezes_vae_clip():
    from topomap_tpu.train.optim import LABELERS, label_params

    cfg = PipelineConfig.tiny(with_clip=True)
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    labels = label_params(params, LABELERS["full"])
    flat = {
        "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path): l
        for path, l in jax.tree_util.tree_flatten_with_path(labels)[0]
    }
    by_coll = {}
    for k, l in flat.items():
        by_coll.setdefault(k.split("/")[0], set()).add(l)
    assert by_coll["unet"] == {"unet"}
    assert by_coll["controlnet"] == {"controlnet"}
    assert by_coll["adapter"] == {"adapter"}
    assert by_coll["bert"] == {"bert"}
    assert by_coll["vae"] == {"frozen"}
    assert by_coll["clip"] == {"frozen"}
    assert by_coll["unet_lora"] == {"frozen"} and by_coll["ctrl_lora"] == {"frozen"}
