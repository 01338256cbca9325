import jax.numpy as jnp
import numpy as np

from topomap_tpu.data.synthetic import CLASS_COLORS, generate_seg_tile, apply_style
from topomap_tpu.ops import (
    PALETTE_EVAL,
    add_contour_lines,
    class_mask_to_rgb,
    crop_to_multiple,
    rgb_to_class_mask,
    stitch_tiles,
    tile_sheet,
    to_signed,
    from_signed,
)


def test_tile_stitch_roundtrip():
    sheet = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    tiles = tile_sheet(jnp.asarray(sheet), dim=2)
    assert tiles.shape == (2 * 3, 2, 2, 3)
    # Row-major order: tile 0 is top-left.
    np.testing.assert_array_equal(np.asarray(tiles[0]), sheet[:2, :2])
    np.testing.assert_array_equal(np.asarray(tiles[1]), sheet[:2, 2:4])
    back = stitch_tiles(tiles, rows=2, cols=3)
    np.testing.assert_array_equal(np.asarray(back), sheet)


def test_crop_to_multiple():
    img = jnp.zeros((515, 1030, 3), jnp.uint8)
    out = crop_to_multiple(img, 512)
    assert out.shape == (512, 1024, 3)


def test_rgb_to_class_mask_train_palette():
    seg = generate_seg_tile(0)
    mask = np.asarray(rgb_to_class_mask(jnp.asarray(seg)))
    # Every palette color must map to its class id.
    assert mask[np.all(seg == (255, 255, 255), axis=-1)].tolist().count(4) > 0
    assert set(np.unique(mask)).issubset(set(range(9)))
    # Lake pixels (if present) are class 0; buildings class 5.
    b_hit = np.all(seg == (5, 5, 5), axis=-1)
    if b_hit.any():
        assert np.all(mask[b_hit] == 5)
    # Unknown colors fall back to background (4).
    odd = jnp.full((4, 4, 3), 123, jnp.uint8)
    np.testing.assert_array_equal(np.asarray(rgb_to_class_mask(odd)), 4)


def test_rgb_to_class_mask_eval_palette_paths_black():
    # Eval palette: paths are black (0,0,0), ignore is red (createMask.py:139-145).
    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = (0, 0, 0)     # paths
    img[0, 1] = (255, 0, 0)   # ignore
    img[1, 0] = (82, 82, 82)  # building (eval)
    img[1, 1] = (55, 126, 184)  # lake
    mask = np.asarray(rgb_to_class_mask(jnp.asarray(img), palette=PALETTE_EVAL))
    assert mask[0, 0] == 7 and mask[0, 1] == 8 and mask[1, 0] == 5 and mask[1, 1] == 0


def test_class_mask_roundtrip():
    seg = generate_seg_tile(3)
    mask = rgb_to_class_mask(jnp.asarray(seg))
    rgb = np.asarray(class_mask_to_rgb(mask))
    # Painting back the train palette must reproduce the original exactly
    # (synthetic tiles only use palette colors).
    np.testing.assert_array_equal(rgb, seg)


def test_add_contour_lines_skips_buildings():
    sheet = np.full((4, 4, 3), 200, np.uint8)
    sheet[0, 0] = (10, 10, 10)  # building (dark)
    contours = np.zeros((4, 4, 3), np.uint8)
    contours[0, 0] = (184, 94, 20)
    contours[1, 1] = (184, 94, 20)
    out = np.asarray(add_contour_lines(jnp.asarray(sheet), jnp.asarray(contours)))
    np.testing.assert_array_equal(out[0, 0], (10, 10, 10))  # building preserved
    np.testing.assert_array_equal(out[1, 1], (184, 94, 20))  # contour drawn
    np.testing.assert_array_equal(out[2, 2], (200, 200, 200))  # untouched


def test_signed_range_roundtrip():
    img = np.asarray([[0, 127, 255]], np.uint8).reshape(1, 3, 1)
    x = to_signed(jnp.asarray(img))
    assert float(x.min()) == -1.0 and abs(float(x.max()) - 1.0) < 1e-6
    back = np.asarray(from_signed(x))
    np.testing.assert_array_equal(back, img)


def test_apply_style_recolors_only_target_class():
    seg = generate_seg_tile(1)
    styled = apply_style(seg, "Set Forest color to dark green")
    forest = np.all(seg == np.asarray(CLASS_COLORS["forest"], np.uint8), axis=-1)
    if forest.any():
        assert np.all(styled[forest] == (20, 90, 30))
    np.testing.assert_array_equal(styled[~forest], seg[~forest])


def test_overlap_positions_cover_and_pin_last():
    from topomap_tpu.ops.image import overlap_positions

    pos = overlap_positions(160, 64, 16)  # stride 48: 0,48,96 then pinned 96? 96+64=160 ok
    assert pos[0] == 0 and pos[-1] == 160 - 64
    assert all(b - a <= 64 - 16 for a, b in zip(pos, pos[1:]))
    assert overlap_positions(128, 64, 0) == [0, 64]


def test_tile_overlap_blend_reconstructs_constant_regions():
    """Identity check: blending back the very tiles cut from a sheet returns the sheet
    exactly (weights sum to the same profile in every covered pixel)."""
    from topomap_tpu.ops.image import stitch_tiles_blend, tile_sheet_overlap

    rng = np.random.RandomState(0)
    sheet = rng.randint(0, 256, (160, 224, 3), np.uint8)
    tiles, ys, xs = tile_sheet_overlap(jnp.asarray(sheet), dim=64, overlap=16)
    assert tiles.shape == (len(ys) * len(xs), 64, 64, 3)
    out = np.asarray(stitch_tiles_blend(tiles, ys, xs, overlap=16))
    np.testing.assert_array_equal(out, sheet)


def test_blend_feathers_seam():
    """Two half-overlapping constant tiles: the overlap column band must cross-fade
    monotonically from one value to the other instead of a hard jump."""
    from topomap_tpu.ops.image import stitch_tiles_blend

    dim, ov = 64, 32
    t0 = np.full((dim, dim, 3), 50, np.uint8)
    t1 = np.full((dim, dim, 3), 200, np.uint8)
    tiles = jnp.asarray(np.stack([t0, t1]))
    out = np.asarray(stitch_tiles_blend(tiles, [0], [0, dim - ov], ov)).astype(np.int32)
    band = out[dim // 2, dim - ov : dim, 0]
    assert band[0] <= 80 and band[-1] >= 170
    assert np.all(np.diff(band) >= 0)
    np.testing.assert_array_equal(out[:, : dim - ov], 50)
    np.testing.assert_array_equal(out[:, dim:], 200)
