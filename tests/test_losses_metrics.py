import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.eval.losslog import (
    append_train,
    append_val,
    load_loss_log,
    new_loss_log,
    save_loss_log,
)
from topomap_tpu.eval.metrics import (
    best_of_n_vote,
    color_histogram_l1,
    l1_01,
    mean_iou,
    mse_rgb,
    psnr_rgb,
    siegfried_mask_mse,
)
from topomap_tpu.train.losses import (
    eps_mse,
    extract_rgb_mask,
    lpips_distance,
    lpips_init,
    masked_color_losses,
    maskloss_total,
    parse_prompt_class,
    prompt_class_rgb,
    ssim_3x3,
)
from topomap_tpu.train.optim import warmup_cosine_floor


def test_parse_prompt_class_keyword_priority():
    # "Through road" must win over "Road" (reference dict order, maskloss.py:66-76)
    assert parse_prompt_class("Set Through road color to red") == "Through_road"
    assert parse_prompt_class("Set Road color to red") == "Street_road"
    assert parse_prompt_class("Render Forest with hatch") == "Forest"
    assert parse_prompt_class("nothing here") is None


def test_extract_rgb_mask_tolerance():
    seg = jnp.zeros((1, 4, 4, 3))
    seg = seg.at[0, 0, 0].set(jnp.asarray([77, 175, 74]) / 255.0)
    seg = seg.at[0, 1, 1].set(jnp.asarray([78, 175, 74]) / 255.0)  # within tol 5 (L1=1)
    seg = seg.at[0, 2, 2].set(jnp.asarray([90, 175, 74]) / 255.0)  # outside
    rgb = prompt_class_rgb(["Forest please"])
    mask = np.asarray(extract_rgb_mask(seg, rgb))
    assert mask[0, 0, 0, 0] == 1 and mask[0, 1, 1, 0] == 1 and mask[0, 2, 2, 0] == 0


def test_masked_color_losses_and_schedule():
    seg = jnp.zeros((1, 2, 2, 3)).at[0, 0, 0].set(jnp.asarray([77, 175, 74]) / 255.0)
    pred = jnp.zeros((1, 2, 2, 3))
    gt = jnp.ones((1, 2, 2, 3))
    rgb = prompt_class_rgb(["Forest x"])
    lc, ls = masked_color_losses(pred, gt, seg, rgb)
    # masked: 1 px of 4 → mean over full tensor = 3/12; stable: 3 px → 9/12
    np.testing.assert_allclose(float(lc), 3 / 12, atol=1e-6)
    np.testing.assert_allclose(float(ls), 9 / 12, atol=1e-6)
    t_before = maskloss_total(jnp.asarray(0.5), lc, ls, jnp.asarray(100), warmup_steps=1000)
    t_after = maskloss_total(jnp.asarray(0.5), lc, ls, jnp.asarray(2000), warmup_steps=1000)
    np.testing.assert_allclose(float(t_before), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(t_after), 0.5 + 5 * (3 / 12 + 9 / 12), atol=1e-5)


def test_no_class_prompt_gives_empty_mask():
    seg = jnp.ones((1, 2, 2, 3))
    rgb = prompt_class_rgb(["plain prompt"])
    mask = np.asarray(extract_rgb_mask(seg, rgb))
    assert mask.sum() == 0


def test_synthetic_palette_masks_every_styled_prompt():
    """With palette="synthetic", every STYLE_PROMPTS entry that recolors a class must
    extract a non-empty mask from a synthetic seg tile — the reference palette misses
    Building (82,82,82 vs createMask's 5,5,5) and Background, silently zeroing the
    color loss for those prompts."""
    from topomap_tpu.data.synthetic import STYLE_PROMPTS, generate_seg_tile, SyntheticTileConfig

    cfg = SyntheticTileConfig(size=128, n_blobs=4, n_lines=6, n_buildings=6)
    styled = [p for p in STYLE_PROMPTS if STYLE_PROMPTS[p]]
    rgb = prompt_class_rgb(styled, palette="synthetic")
    # line kinds are drawn at random per tile — accumulate over a few seeds so every
    # class (roads included) appears somewhere, as it does in a real dataset
    per_prompt = np.zeros(len(styled))
    for seed in range(4):
        seg = jnp.asarray(generate_seg_tile(seed, cfg), jnp.float32)[None] / 255.0
        mask = np.asarray(extract_rgb_mask(jnp.tile(seg, (len(styled), 1, 1, 1)), rgb))
        per_prompt += mask.sum(axis=(1, 2, 3))
    assert (per_prompt > 0).all(), dict(zip(styled, per_prompt.tolist()))
    # the reference palette, for comparison, must still resolve Forest identically
    np.testing.assert_array_equal(
        np.asarray(prompt_class_rgb(["Set Forest color to dark green"])), [[77, 175, 74]]
    )


def test_ssim_identity_and_bounds():
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    np.testing.assert_allclose(float(ssim_3x3(img, img)), 1.0, atol=1e-5)
    other = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    assert float(ssim_3x3(img, other)) < 1.0


def test_lpips_zero_for_identical_and_positive_otherwise():
    p = lpips_init(jax.random.PRNGKey(0), width_mult=0.1)
    a = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    b = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
    assert abs(float(lpips_distance(p, a, a))) < 1e-6
    assert np.isfinite(float(lpips_distance(p, a, b)))


def test_mse_psnr():
    a = jnp.zeros((4, 4, 3))
    b = jnp.full((4, 4, 3), 10.0)
    np.testing.assert_allclose(float(mse_rgb(a, b)), 100.0)
    np.testing.assert_allclose(float(psnr_rgb(a, b)), 10 * np.log10(255**2 / 100), rtol=1e-5)
    np.testing.assert_allclose(float(l1_01(a / 255, b / 255)), 10 / 255, rtol=1e-5)


def test_color_histogram_matches_numpy_density():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (16, 16, 3)).astype(np.float32)
    b = rng.integers(0, 256, (16, 16, 3)).astype(np.float32)
    ours = float(color_histogram_l1(jnp.asarray(a), jnp.asarray(b)))
    ref = 0.0
    for ch in range(3):
        hp, _ = np.histogram(a[:, :, ch], bins=32, range=(0, 255), density=True)
        hg, _ = np.histogram(b[:, :, ch], bins=32, range=(0, 255), density=True)
        ref += np.abs(hp - hg).sum()
    np.testing.assert_allclose(ours, ref / 3.0, rtol=1e-5)


def test_mean_iou_perfect_and_remap():
    gt = jnp.asarray([[0, 1], [2, 8]])
    np.testing.assert_allclose(float(mean_iou(gt, gt)), 1.0)
    pred = jnp.asarray([[0, 1], [1, 8]])
    v = float(mean_iou(pred, gt))
    assert 0 < v < 1
    # 8 remaps to 0 in both → pred==gt at that pixel counts as intersection for class 0
    gt2 = jnp.asarray([[8, 8], [8, 8]])
    pred2 = jnp.asarray([[0, 0], [0, 0]])
    np.testing.assert_allclose(float(mean_iou(pred2, gt2)), 1.0)


def test_siegfried_mask_mse_weighted():
    control = np.full((4, 4, 3), 255, np.uint8)  # all background
    pred = np.full((4, 4, 3), 240, np.float32)
    pred[..., 1] = 238
    pred[..., 2] = 223
    v = float(siegfried_mask_mse(jnp.asarray(pred), jnp.asarray(control)))
    np.testing.assert_allclose(v, 0.0, atol=1e-5)  # exact expected colors → zero
    pred2 = np.zeros((4, 4, 3), np.float32)
    v2 = float(siegfried_mask_mse(jnp.asarray(pred2), jnp.asarray(control)))
    expected = np.mean(np.asarray([240.0, 238.0, 223.0]) ** 2)
    np.testing.assert_allclose(v2, expected, rtol=1e-5)


def test_best_of_n_vote():
    assert best_of_n_vote(np.asarray([0.1, 0.9]), np.asarray([5.0, 1.0])) == 1  # agree
    assert best_of_n_vote(np.asarray([0.9, 0.1]), np.asarray([5.0, 1.0])) == 0  # miou wins


def test_eps_mse_fp32_promotion():
    a = jnp.ones((2, 2), jnp.bfloat16)
    b = jnp.zeros((2, 2), jnp.bfloat16)
    out = eps_mse(a, b)
    assert out.dtype == jnp.float32 and float(out) == 1.0


def test_warmup_cosine_floor_schedule():
    s = warmup_cosine_floor(1e-4, warmup=100, total=1000, floor=1e-5)
    assert abs(float(s(0)) - 1e-5) < 1e-9  # 0.1 * base at step 0
    np.testing.assert_allclose(float(s(50)), 0.5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(100)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(550)), 0.5e-4, rtol=1e-3)  # cosine midpoint
    np.testing.assert_allclose(float(s(1000)), 1e-5, rtol=1e-5)  # floor
    np.testing.assert_allclose(float(s(5000)), 1e-5, rtol=1e-5)  # clamped past total


def test_losslog_roundtrip_and_resume(tmp_path):
    log = new_loss_log()
    append_train(log, 1, 0.5, 0.5)
    append_val(log, 1, 0.4, 0.1, 0.9)
    p = tmp_path / "loss_log.json"
    save_loss_log(log, p)
    log2 = load_loss_log(p)
    assert log2 == log
    append_train(log2, 2, 0.3, 0.4)
    save_loss_log(log2, p)
    log3 = load_loss_log(p)
    assert log3["step"] == [1, 2]
    # schema keys exactly match the reference (addlrSD.py:78-83)
    assert set(log3) == {"step", "train_mse", "ema", "val_step", "val_mse", "val_l1", "val_ssim"}


def test_losslog_trim_on_resume():
    """Resume dedup (VERDICT r3 #7): rows past the restored step are dropped so the re-run
    steps don't duplicate (reference merge semantics, addlrSD.py:72-83)."""
    from topomap_tpu.eval.losslog import trim_to_step

    log = new_loss_log()
    for s in range(1, 9):
        append_train(log, s, 0.1 * s, 0.1 * s)
    append_val(log, 4, 0.4, 0.14, 0.94)
    append_val(log, 8, 0.8, 0.18, 0.98)
    trim_to_step(log, 5)  # resumed from a step-5 checkpoint
    assert log["step"] == [1, 2, 3, 4, 5]
    assert log["val_step"] == [4]
    assert log["val_mse"] == [0.4] and log["val_l1"] == [0.14] and log["val_ssim"] == [0.94]
    # idempotent + no-op when nothing exceeds the step
    trim_to_step(log, 5)
    assert log["step"] == [1, 2, 3, 4, 5]


def test_losslog_repair_polluted():
    """repair_loss_log reconstructs a log written by pre-fix resumes (duplicate overlap)."""
    from topomap_tpu.eval.losslog import repair_loss_log

    log = new_loss_log()
    for s in range(1, 7):  # first run reached step 6
        append_train(log, s, 1.0 + s, 1.0 + s)
    append_val(log, 2, 2.0)
    append_val(log, 4, 4.0)
    append_val(log, 6, 6.0)
    for s in range(4, 9):  # resume from step-3 ckpt re-ran 4..8 and re-measured vals
        append_train(log, s, 2.0 + s, 2.0 + s)
    append_val(log, 4, 4.5)
    append_val(log, 6, 6.5)
    append_val(log, 8, 8.5)
    fixed = repair_loss_log(log)
    assert fixed["step"] == [1, 2, 3, 4, 5, 6, 7, 8]
    # post-resume rows win where they overlap
    assert fixed["train_mse"] == [2.0, 3.0, 4.0, 6.0, 7.0, 8.0, 9.0, 10.0]
    assert fixed["val_step"] == [2, 4, 6, 8]
    assert fixed["val_mse"] == [2.0, 4.5, 6.5, 8.5]
