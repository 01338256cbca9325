"""Best-of-N Siegfried eval and A/B run comparison."""
import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.core import make_schedule
from topomap_tpu.eval.compare import compare_runs, infer_lora_ranks, load_variant
from topomap_tpu.eval.siegfried import generate_best_of_n
from topomap_tpu.models.unet_seg import SegUNetConfig, seg_unet_init
from topomap_tpu.pipeline import PipelineConfig, encode_text, init_pipeline, make_tokenizers, simulate_pretrained
from topomap_tpu.utils.checkpoint import save_filtered

CFG = PipelineConfig.tiny()
SCHED = make_schedule(1000)


def _params(seed=0):
    return simulate_pretrained(init_pipeline(jax.random.PRNGKey(seed), CFG), jax.random.PRNGKey(seed + 1))


def _batch():
    tok, _ = make_tokenizers(CFG)
    ids, mask = tok.encode(["Set Building color to red"])
    from topomap_tpu.data.synthetic import generate_seg_tile

    seg = generate_seg_tile(0)[:32, :32] / 255.0
    return {
        "seg": jnp.asarray(seg[None], jnp.float32),
        "gt": jnp.zeros((1, 32, 32, 3)),
        "ids": jnp.asarray(ids),
        "mask": jnp.asarray(mask),
    }


def test_generate_best_of_n_palette_fallback():
    params = _params()
    batch = _batch()
    c = encode_text(params, CFG, batch["ids"], batch["mask"])
    tile, report = generate_best_of_n(
        params, CFG, SCHED, batch["seg"], c, seg_model=None, num_samples=3, steps=2
    )
    assert tile.shape == (32, 32, 3) and tile.dtype == np.uint8
    assert len(report["miou"]) == 3 and 0 <= report["picked"] < 3
    assert np.isfinite(report["avg_mask_mse"])


def test_generate_best_of_n_with_seg_model():
    params = _params()
    batch = _batch()
    c = encode_text(params, CFG, batch["ids"], batch["mask"])
    scfg = SegUNetConfig.tiny()
    sp = seg_unet_init(jax.random.PRNGKey(3), scfg)
    _tile, report = generate_best_of_n(
        params, CFG, SCHED, batch["seg"], c, seg_model=(sp, scfg), num_samples=2, steps=2
    )
    assert len(report["mask_mse"]) == 2


def test_infer_lora_ranks():
    flat = {
        "encoder/blocks/1/attn/blocks/0/attn2/to_k/A": np.zeros((32, 4)),
        "encoder/blocks/1/attn/blocks/0/attn2/to_k/B": np.zeros((4, 32)),
        "encoder/blocks/1/attn/blocks/0/attn1/to_q/A": np.zeros((32, 2)),
    }
    ranks = infer_lora_ranks(flat)
    assert ranks == {"to_k": 4, "to_q": 2}


def test_compare_runs_two_variants(tmp_path):
    params = _params()
    # Write two "runs": base-init and a perturbed adapter.
    import copy

    run_a = tmp_path / "a"
    run_b = tmp_path / "b"
    save_filtered(run_a, params, 10)
    perturbed = copy.deepcopy(params)
    perturbed["adapter"] = jax.tree.map(lambda x: x + 0.5, perturbed["adapter"])
    save_filtered(run_b, perturbed, 10)

    batch = _batch()
    outs = compare_runs(
        params, CFG, SCHED, batch,
        {"A": (str(run_a), 10), "B": (str(run_b), 10)},
        out_png=tmp_path / "ab.png", steps=2,
    )
    assert set(outs) == {"A", "B"}
    assert (tmp_path / "ab.png").exists()
    # different adapters ⇒ different images
    assert not np.array_equal(outs["A"], outs["B"])
    # variant loading really overlays
    v = load_variant(params, run_b, 10)
    np.testing.assert_allclose(
        np.asarray(v["adapter"]["out"]["w"]),
        np.asarray(perturbed["adapter"]["out"]["w"]),
        atol=1e-6,
    )


def test_sample_compositional(tmp_path):
    from topomap_tpu.eval.compositional import sample_compositional

    params = _params()
    tok, _ = make_tokenizers(CFG)
    seg = jnp.zeros((1, 32, 32, 3))
    outs = sample_compositional(
        params, CFG, SCHED, tok, seg,
        prompts=["Set Forest color to dark green, Set Lake color to turquoise"],
        steps=2, out_png=tmp_path / "comp.png",
    )
    assert len(outs) == 1
    img = next(iter(outs.values()))
    assert img.shape == (1, 32, 32, 3) and img.dtype == np.uint8
    assert (tmp_path / "comp.png").exists()
