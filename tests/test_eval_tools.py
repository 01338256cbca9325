"""Segmentation U-Net, prompt analysis, latent cache, preview sampling, grid writers."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from topomap_tpu.core import make_schedule
from topomap_tpu.data.latent_cache import (
    CachedBatchIterator,
    build_latent_cache,
    load_latent_cache,
    sample_cached_latents,
    save_latent_cache,
)
from topomap_tpu.data.pairs import PairsDataset
from topomap_tpu.data.synthetic import generate_pairs_dataset
from topomap_tpu.eval.grids import make_grid, save_abc_grid, save_concept_grid, save_triplet_grid
from topomap_tpu.eval.prompt_analysis import (
    category_separation,
    compositionality_check,
    cosine_matrix,
    lora_weight_norm_audit,
    pca_project,
)
from topomap_tpu.eval.metrics import mean_iou
from topomap_tpu.models.unet_seg import (
    SegUNetConfig,
    make_seg_train_step,
    predict_classes,
    seg_unet_apply,
    seg_unet_init,
)
from topomap_tpu.ops.image import rgb_to_class_mask


def test_seg_unet_shapes_and_training_improves_miou():
    cfg = SegUNetConfig.tiny()
    p = seg_unet_init(jax.random.PRNGKey(0), cfg)
    from topomap_tpu.data.synthetic import generate_seg_tile

    seg = generate_seg_tile(0)[:32, :32]
    img = jnp.asarray(seg[None] / 255.0, jnp.float32)
    mask = rgb_to_class_mask(jnp.asarray(seg))[None]
    logits = seg_unet_apply(p, cfg, img)
    assert logits.shape == (1, 32, 32, 9)

    tx = optax.adam(3e-3)
    step = make_seg_train_step(cfg, tx)
    opt_state = tx.init(p)
    miou0 = float(mean_iou(predict_classes(p, cfg, img), mask))
    losses = []
    for _ in range(120):
        p, opt_state, loss = step(p, opt_state, img, mask)
        losses.append(float(loss))
    miou1 = float(mean_iou(predict_classes(p, cfg, img), mask))
    assert miou1 > miou0
    assert losses[-1] < losses[0]


def test_cosine_matrix_and_pca():
    emb = np.random.default_rng(0).normal(size=(6, 16))
    cm = cosine_matrix(emb)
    np.testing.assert_allclose(np.diag(cm), 1.0, atol=1e-9)
    assert np.allclose(cm, cm.T)
    proj = pca_project(emb, 2)
    assert proj.shape == (6, 2)


def test_category_separation_separable_clusters():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(10, 8)) + np.asarray([5.0] + [0] * 7)
    b = rng.normal(size=(10, 8)) - np.asarray([5.0] + [0] * 7)
    emb = np.concatenate([a, b])
    labels = ["a"] * 10 + ["b"] * 10
    res = category_separation(emb, labels)
    assert res["silhouette"] > 0.3
    assert set(res["compactness"]) == {"a", "b"}
    assert res["confusable_pairs"][0][:2] == ("a", "b")


def test_compositionality_check_with_synthetic_encoder():
    """An encoder that maps category keywords to orthogonal axes must PASS composed prompts."""
    axes = {"color": 0, "style": 1, "visib": 2}

    def encode(texts):
        out = np.zeros((len(texts), 8))
        for i, t in enumerate(texts):
            for kw, ax in axes.items():
                if kw in t:
                    out[i, ax] += 1.0
            out[i, 7] = 0.01  # avoid zero vectors
        return out

    cats = {
        "color": ["color red", "color blue", "color green"],
        "style": ["style dashed", "style dotted", "style bold"],
        "visib": ["visib on", "visib off", "visib half"],
    }
    res = compositionality_check(
        encode,
        [("color red style dashed", ("color", "style")), ("visib on", ("visib",))],
        categories=cats,
        topk=3,
    )
    assert all(r["pass"] for r in res)
    assert res[1]["nn_coverage"]


def test_lora_weight_norm_audit():
    from topomap_tpu.lora import LoRASpec, build_lora_tree
    from topomap_tpu.models.unet import UNetConfig, unet_init

    params = unet_init(jax.random.PRNGKey(0), UNetConfig.tiny())
    lora = build_lora_tree(params, LoRASpec.kv(4), jax.random.PRNGKey(1))
    audit = lora_weight_norm_audit(lora)
    assert audit["attn1"]["count"] > 0 and audit["attn2"]["count"] > 0
    assert audit["attn1"]["mean"] == 0.0  # B zero at init


def test_latent_cache_roundtrip(tmp_path):
    from topomap_tpu.pipeline import PipelineConfig, init_pipeline

    cfg = PipelineConfig.tiny()
    params = init_pipeline(jax.random.PRNGKey(0), cfg)
    recs = generate_pairs_dataset(tmp_path / "d", n_tiles=2, prompts=["", "Set Lake color to turquoise"])
    ds = PairsDataset(recs, size=32)
    cache = build_latent_cache(params, cfg, ds, batch_size=2)
    assert cache["mean"].shape == (4, 16, 16, 4) and cache["mean"].dtype == np.float16
    save_latent_cache(cache, tmp_path / "cache.npz")
    back = load_latent_cache(tmp_path / "cache.npz")
    np.testing.assert_array_equal(back["mean"], cache["mean"])
    assert back["prompt"] == cache["prompt"]

    it = iter(CachedBatchIterator(back, batch_size=2, seed=0))
    b = next(it)
    z = sample_cached_latents(jax.random.PRNGKey(0), b["mean"], b["logvar"], cfg.vae.scale_factor)
    assert z.shape == (2, 16, 16, 4) and np.isfinite(np.asarray(z)).all()


def test_grid_writers(tmp_path):
    seg = np.zeros((2, 8, 8, 3), np.uint8)
    pred = np.full((2, 8, 8, 3), 128, np.uint8)
    gt = np.full((2, 8, 8, 3), 255, np.uint8)
    g = make_grid([seg, pred, gt])
    assert g.ndim == 3 and g.shape[2] == 3
    save_concept_grid(tmp_path / "c.png", seg, pred, gt, prompt="test prompt")
    save_triplet_grid(tmp_path / "t.png", seg[0], pred[0], gt[0], prompt="x")
    save_abc_grid(tmp_path / "abc.png", seg, pred, pred, pred, gt)
    assert (tmp_path / "c.png").exists() and (tmp_path / "t.png").exists()


def test_preview_three_modes_and_cnlora():
    from topomap_tpu.eval.sampling import preview_three_modes, sample_preview_cnlora
    from topomap_tpu.lora import LoRASpec
    from topomap_tpu.pipeline import PipelineConfig, init_pipeline, make_tokenizers, simulate_pretrained
    import dataclasses as dc

    cfg = PipelineConfig.tiny(with_clip=True)
    # conditional ctrl-lora with cond_dim = model_channels + context_dim
    cond_dim = cfg.unet.model_channels + cfg.unet.context_dim
    cfg = dc.replace(cfg, ctrl_lora=LoRASpec.cn_lora(2, cond_dim=cond_dim))
    params = simulate_pretrained(init_pipeline(jax.random.PRNGKey(0), cfg), jax.random.PRNGKey(1))
    sched = make_schedule(1000)
    tok, ctok = make_tokenizers(cfg)
    ids, mask = tok.encode(["Set Lake color to navy blue"])
    clip_ids = ctok.encode(["map in swisstopo style"])
    batch = {
        "seg": jnp.zeros((1, 32, 32, 3)),
        "ids": jnp.asarray(ids),
        "mask": jnp.asarray(mask),
    }
    out = preview_three_modes(params, cfg, sched, batch, jnp.asarray(clip_ids), steps=2)
    assert set(out) == {"A", "B", "C"}
    for img in out.values():
        assert img.shape == (1, 32, 32, 3) and np.isfinite(np.asarray(img)).all()

    img = sample_preview_cnlora(params, cfg, sched, batch, steps=2)
    assert img.shape == (1, 32, 32, 3) and np.isfinite(np.asarray(img)).all()


def test_umap_project_separates_clusters_and_is_deterministic():
    """Self-contained UMAP (eval/umap_impl.py, PromptTest_UMAP.py:252-266 protocol):
    well-separated high-D clusters stay separated in 2-D; fixed seed is deterministic."""
    from topomap_tpu.eval.umap_impl import umap_project

    rng = np.random.default_rng(0)
    centers = rng.normal(0, 10.0, (3, 16))
    x = np.concatenate([c + rng.normal(0, 0.3, (12, 16)) for c in centers])
    labels = np.repeat(np.arange(3), 12)

    emb = umap_project(x, n_neighbors=8, seed=42)
    assert emb.shape == (36, 2) and np.isfinite(emb).all()
    emb2 = umap_project(x, n_neighbors=8, seed=42)
    np.testing.assert_array_equal(emb, emb2)

    cents = np.stack([emb[labels == c].mean(0) for c in range(3)])
    intra = np.mean([np.linalg.norm(emb[labels == c] - cents[c], axis=1).mean() for c in range(3)])
    inter = np.mean([np.linalg.norm(cents[i] - cents[j]) for i in range(3) for j in range(i + 1, 3)])
    assert inter > 2.0 * intra, (inter, intra)
    # nearest-neighbor purity: every point's closest other point shares its cluster
    d = np.linalg.norm(emb[:, None] - emb[None, :], axis=-1) + np.eye(36) * 1e9
    purity = np.mean(labels[np.argmin(d, axis=1)] == labels)
    assert purity > 0.9, purity
