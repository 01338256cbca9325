"""XLA-compiled map-image operations: tiling, class masks, stitching, contour compositing.

The reference performs all of these on the host with cv2/numpy Python loops
(``BaseModel/datasetCreation00.py:30-75`` tiling, ``BaseModel/createMask.py:33-159`` RGB→class
masks, ``BaseModel/stitchTiles.py:6-45`` stitching, ``BaseModel/addContourLines.py:16-26``
contour compositing), crossing the host↔device boundary once per tile. Here every operation is
a pure, batched jnp function, so a whole 5120² sheet stays on device through
tile → encode → denoise → decode → stitch → contours.

Layout convention: images are ``[..., H, W, C]`` uint8 or float; class masks ``[..., H, W]``
int32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Class palette — 9 semantic classes of the Swiss vector maps.
#
# Class ids and priority-overwrite order mirror the reference exactly
# (``createMask.py:71-81``): later writes win; unmatched pixels become background;
# lake is written LAST so it overrides everything.
# ---------------------------------------------------------------------------

CLASS_NAMES = (
    "lake",        # 0
    "forest",      # 1
    "stream",      # 2
    "roads",       # 3
    "background",  # 4
    "building",    # 5
    "river",       # 6
    "paths",       # 7
    "ignore",      # 8
)
NUM_CLASSES = 9

# (class_id, RGB) in the reference's overwrite order (createMask.py:72-81).
_COMMON = [
    (4, (255, 255, 255)),  # background
    (1, (77, 175, 74)),    # forest
    (3, (149, 74, 162)),   # roads
    (2, (63, 96, 132)),    # stream
    (6, (96, 147, 201)),   # river
]
# "siegfriedSource" palette — GT masks for U-Net training (createMask.py:33-81).
PALETTE_SIEGFRIED_SOURCE = (
    [(5, (5, 5, 5))] + _COMMON + [(7, (255, 0, 0)), (8, (247, 128, 30)), (0, (55, 126, 184))]
)
# Evaluation palette — ControlNet-for-Siegfried eval (createMask.py:111-159).
PALETTE_EVAL = (
    [(5, (82, 82, 82))] + _COMMON + [(7, (0, 0, 0)), (8, (255, 0, 0)), (0, (55, 126, 184))]
)

# Canonical colors to paint a class mask back to RGB (used by the synthetic data
# generator and mask visualization); one color per class id, from the train palette.
_CLASS_RGB = np.zeros((NUM_CLASSES, 3), np.uint8)
for _cid, _rgb in PALETTE_SIEGFRIED_SOURCE:
    _CLASS_RGB[_cid] = _rgb
CLASS_RGB = jnp.asarray(_CLASS_RGB)


def rgb_to_class_mask(
    img: jnp.ndarray, palette=PALETTE_SIEGFRIED_SOURCE, tolerance: int = 0
) -> jnp.ndarray:
    """Exact-RGB-match class mask, priority order identical to ``createMask.py``.

    ``img``: ``[..., H, W, 3]`` uint8. Returns ``[..., H, W]`` int32 in [0, 8].
    Unmatched pixels → background (4); the final palette entry (lake) overrides all.
    """
    img = img.astype(jnp.int32)
    # Reference semantics: building is written first, then overwritten by later classes,
    # then leftover zeros -> background, then lake last. Because "no match -> 4" only
    # applies to pixels matching nothing, a simple sequential where-chain starting from
    # background reproduces it as long as we apply entries in the same order.
    mask = jnp.full(img.shape[:-1], 4, jnp.int32)
    for cid, rgb in palette:
        ref = jnp.asarray(rgb, jnp.int32)
        if tolerance == 0:
            hit = jnp.all(img == ref, axis=-1)
        else:
            hit = jnp.all(jnp.abs(img - ref) <= tolerance, axis=-1)
        mask = jnp.where(hit, cid, mask)
    return mask


def class_mask_to_rgb(mask: jnp.ndarray) -> jnp.ndarray:
    """Paint class ids back to their canonical train-palette RGB. ``[...,H,W] -> [...,H,W,3]``."""
    return CLASS_RGB[mask]


# ---------------------------------------------------------------------------
# Tiling / stitching
# ---------------------------------------------------------------------------


def crop_to_multiple(img: jnp.ndarray, dim: int = 512) -> jnp.ndarray:
    """Crop H and W (leading-corner crop) to the largest multiple of ``dim``.

    Mirrors ``datasetCreation00.process``'s crop-before-split (``:30-75``).
    """
    h, w = img.shape[-3], img.shape[-2]
    return img[..., : (h // dim) * dim, : (w // dim) * dim, :]


def tile_sheet(sheet: jnp.ndarray, dim: int = 512) -> jnp.ndarray:
    """Split a ``[H, W, C]`` sheet into ``[rows*cols, dim, dim, C]`` tiles, row-major.

    XLA equivalent of the ``np.split`` grid in ``datasetCreation00.py:30-75``; a pure
    reshape/transpose, so it fuses with whatever consumes the tiles.
    """
    sheet = crop_to_multiple(sheet, dim)
    h, w, c = sheet.shape
    rows, cols = h // dim, w // dim
    t = sheet.reshape(rows, dim, cols, dim, c)
    return t.transpose(0, 2, 1, 3, 4).reshape(rows * cols, dim, dim, c)


def stitch_tiles(tiles: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    """Reassemble row-major ``[rows*cols, dim, dim, C]`` tiles into ``[rows*dim, cols*dim, C]``.

    Replaces the hstack/vstack host loop of ``stitchTiles.py:6-45`` (10×10 → 5120²).
    """
    n, dim, dim2, c = tiles.shape
    assert n == rows * cols and dim == dim2, (tiles.shape, rows, cols)
    t = tiles.reshape(rows, cols, dim, dim, c)
    return t.transpose(0, 2, 1, 3, 4).reshape(rows * dim, cols * dim, c)


def overlap_positions(extent: int, dim: int, overlap: int) -> list[int]:
    """Leading-corner offsets of overlapped tiles covering ``[0, extent)``.

    Stride is ``dim - overlap``; the final tile is pinned to ``extent - dim`` so the whole
    sheet is covered without ragged tails. With ``overlap == 0`` this reduces to the
    disjoint grid of :func:`tile_sheet`.
    """
    if not (0 <= 2 * overlap <= dim):
        raise ValueError(
            f"overlap must satisfy 0 <= 2*overlap <= tile dim (got overlap={overlap}, "
            f"dim={dim}); larger overlaps leave no tile interior to feather into"
        )
    if extent < dim:
        raise ValueError(f"sheet extent {extent} smaller than tile dim {dim}")
    stride = dim - overlap
    pos = list(range(0, extent - dim + 1, stride))
    if pos[-1] != extent - dim:
        pos.append(extent - dim)
    return pos


def tile_sheet_overlap(
    sheet: jnp.ndarray, dim: int = 512, overlap: int = 64
) -> tuple[jnp.ndarray, list[int], list[int]]:
    """Extract overlapped ``[N, dim, dim, C]`` tiles (row-major) plus their y/x offsets.

    Improvement over the reference's disjoint grid (``datasetCreation00.py:30-75``):
    neighbouring tiles share ``overlap`` pixels so :func:`stitch_tiles_blend` can feather
    the seams the reference simply accepts (``stitchTiles.py:6-45``).
    """
    h, w, _ = sheet.shape
    ys = overlap_positions(h, dim, overlap)
    xs = overlap_positions(w, dim, overlap)
    tiles = jnp.stack([sheet[y : y + dim, x : x + dim] for y in ys for x in xs])
    return tiles, ys, xs


def _feather_1d(dim: int, overlap: int) -> jnp.ndarray:
    """Weight profile: linear ramps over the overlap at both ends, 1 in the interior.

    Never reaches zero (ramp starts at 1/(overlap+1)) so sheet-border pixels — covered by
    a single tile — keep nonzero total weight before normalization.
    """
    if overlap == 0:
        return jnp.ones((dim,), jnp.float32)
    if not (0 <= 2 * overlap <= dim):
        raise ValueError(f"overlap {overlap} must satisfy 2*overlap <= dim ({dim})")
    ramp = (jnp.arange(1, overlap + 1, dtype=jnp.float32)) / float(overlap + 1)
    return jnp.concatenate([ramp, jnp.ones((dim - 2 * overlap,), jnp.float32), ramp[::-1]])


def stitch_tiles_blend(
    tiles: jnp.ndarray, ys: list[int], xs: list[int], overlap: int
) -> jnp.ndarray:
    """Feather-blend overlapped row-major tiles back into a ``[H, W, C]`` uint8 sheet.

    Each tile carries a separable triangular weight window over its ``overlap`` margins;
    contributions accumulate in fp32 and are normalized by the accumulated weight, which
    linearly cross-fades every seam instead of the reference's hard hstack/vstack cuts.
    """
    n, dim, _, c = tiles.shape
    assert n == len(ys) * len(xs), (tiles.shape, len(ys), len(xs))
    h, w = ys[-1] + dim, xs[-1] + dim
    w1d = _feather_1d(dim, overlap)
    weight = (w1d[:, None] * w1d[None, :])[..., None]  # [dim, dim, 1]
    offsets = jnp.asarray([(y, x) for y in ys for x in xs], jnp.int32)

    def body(i, acc_num_den):
        num, den = acc_num_den
        y, x = offsets[i, 0], offsets[i, 1]
        tile = tiles[i].astype(jnp.float32) * weight
        num = jax.lax.dynamic_update_slice(
            num, jax.lax.dynamic_slice(num, (y, x, 0), (dim, dim, c)) + tile, (y, x, 0)
        )
        den = jax.lax.dynamic_update_slice(
            den, jax.lax.dynamic_slice(den, (y, x, 0), (dim, dim, 1)) + weight, (y, x, 0)
        )
        return num, den

    num = jnp.zeros((h, w, c), jnp.float32)
    den = jnp.zeros((h, w, 1), jnp.float32)
    num, den = jax.lax.fori_loop(0, n, body, (num, den))
    return jnp.clip(jnp.round(num / den), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Contour compositing
# ---------------------------------------------------------------------------


def add_contour_lines(
    sheet: jnp.ndarray,
    contours: jnp.ndarray,
    line_rgb=(184, 94, 20),
    building_dark_max: int = 50,
) -> jnp.ndarray:
    """Composite brown contour lines onto a generated sheet, skipping buildings.

    Reference ``addContourLines.py:16-26``: pixels of the generated sheet darker than
    ``building_dark_max`` in all channels are buildings — no contour is drawn there;
    elsewhere, wherever the contour raster equals ``line_rgb`` exactly, that color wins.

    ``sheet``/``contours``: ``[..., H, W, 3]`` uint8.
    """
    sheet_i = sheet.astype(jnp.int32)
    building = jnp.all(sheet_i <= building_dark_max, axis=-1)
    line = jnp.asarray(line_rgb, jnp.int32)
    on_line = jnp.all(contours.astype(jnp.int32) == line, axis=-1) & ~building
    return jnp.where(on_line[..., None], jnp.asarray(line_rgb, sheet.dtype), sheet)


# ---------------------------------------------------------------------------
# Resizing / range conversion (dataset transforms, data_utils.py:160-169)
# ---------------------------------------------------------------------------


def resize_nearest(img: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """NEAREST resize of ``[..., H, W, C]`` — seg hints (``data_utils.py:162``)."""
    out_shape = img.shape[:-3] + (hw[0], hw[1], img.shape[-1])
    return jax.image.resize(img, out_shape, method="nearest")


def resize_bilinear(img: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """BILINEAR resize of ``[..., H, W, C]`` — gt rasters (``data_utils.py:166``)."""
    out_shape = img.shape[:-3] + (hw[0], hw[1], img.shape[-1])
    return jax.image.resize(img.astype(jnp.float32), out_shape, method="bilinear")


def to_unit(img_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] → float32 [0,1] (seg-hint range, ``data_utils.py:163``)."""
    return img_u8.astype(jnp.float32) / 255.0


def to_signed(img_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] → float32 [−1,1] (gt/VAE range, ``data_utils.py:167-168``)."""
    return img_u8.astype(jnp.float32) / 127.5 - 1.0


def from_signed(x: jnp.ndarray) -> jnp.ndarray:
    """float [−1,1] → uint8 [0,255] with clamp (decode path, ``vis_metrics.py:450-452``)."""
    return jnp.clip(jnp.round((x + 1.0) * 127.5), 0.0, 255.0).astype(jnp.uint8)
