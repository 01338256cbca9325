"""Native C++ tile loader vs PIL reference."""
import numpy as np
import pytest
from PIL import Image

from topomap_tpu.data.native_loader import decode_png_native, load_batch_native, native_available
from topomap_tpu.data.pairs import PairsDataset
from topomap_tpu.data.synthetic import generate_pairs_dataset, generate_seg_tile

needs_native = pytest.mark.skipif(not native_available(), reason="native loader unavailable")


@needs_native
def test_decode_png_exact(tmp_path):
    img = generate_seg_tile(0)
    p = tmp_path / "t.png"
    Image.fromarray(img).save(p)
    out = decode_png_native(str(p))
    np.testing.assert_array_equal(out, img)


@needs_native
def test_decode_png_rgba_gray_palette(tmp_path):
    rng = np.random.default_rng(0)
    rgba = rng.integers(0, 255, (16, 16, 4), dtype=np.uint8)
    gray = rng.integers(0, 255, (16, 16), dtype=np.uint8)
    pal = Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).convert(
        "P", palette=Image.ADAPTIVE
    )
    for name, im in [("rgba", Image.fromarray(rgba)), ("gray", Image.fromarray(gray)), ("pal", pal)]:
        p = tmp_path / f"{name}.png"
        im.save(p)
        out = decode_png_native(str(p))
        ref = np.array(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(out, ref, err_msg=name)


@needs_native
def test_load_batch_seg_mode_matches_pil(tmp_path):
    img = generate_seg_tile(1)  # 512²
    p = tmp_path / "t.png"
    Image.fromarray(img).save(p)
    out = load_batch_native([str(p)], 256, "seg")
    assert out.shape == (1, 256, 256, 3)
    ref = np.array(Image.fromarray(img).resize((256, 256), Image.NEAREST)) / 255.0
    np.testing.assert_allclose(out[0], ref, atol=1e-6)


@needs_native
def test_load_batch_gt_mode_identity_size(tmp_path):
    img = generate_seg_tile(2)
    p = tmp_path / "t.png"
    Image.fromarray(img).save(p)
    out = load_batch_native([str(p)], 512, "gt")
    ref = img / 127.5 - 1.0
    np.testing.assert_allclose(out[0], ref, atol=1e-6)


@needs_native
def test_load_batch_missing_file_returns_none(tmp_path):
    assert load_batch_native([str(tmp_path / "missing.png")], 64, "seg") is None


@needs_native
def test_dataset_native_path_equals_pil_path(tmp_path):
    recs = generate_pairs_dataset(tmp_path, n_tiles=2, prompts=["", "Set Building color to red"])
    ds_n = PairsDataset(recs, size=512, use_native=True)
    ds_p = PairsDataset(recs, size=512, use_native=False)
    bn = next(ds_n.iter_batches(4, shuffle=False))
    bp = next(ds_p.iter_batches(4, shuffle=False))
    np.testing.assert_allclose(bn["seg"], bp["seg"], atol=1e-6)
    np.testing.assert_allclose(bn["gt"], bp["gt"], atol=1e-6)
    assert bn["prompt"] == bp["prompt"]
