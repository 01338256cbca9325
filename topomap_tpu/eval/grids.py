"""Concept/triplet/AB(-C) grid-image writers — the reference's visual-regression artifacts.

Mirrors ``vis_metrics.py``: ``save_concept_grid`` (seg/pred/gt rows, ``:15-60``),
``save_triplet_grid`` with prompt caption (``:165-214``), ``save_ab_grid`` (``:284-335``),
``save_abc_grid`` (``:616-648``). Images come in as [N,H,W,3] uint8 (rows) and go out as one
PNG. Caption rendering uses PIL's default font when available and silently skips otherwise.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def _to_u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8) if img.min() < 0 else np.clip(
            img * (255.0 if img.max() <= 1.0 else 1.0), 0, 255
        ).astype(np.uint8)
    return img


def make_grid(rows: list[np.ndarray], pad: int = 2, pad_value: int = 255) -> np.ndarray:
    """rows: list of [N,H,W,3] — each list entry becomes one grid row of N columns."""
    rows = [_to_u8(r) for r in rows]
    n = max(r.shape[0] for r in rows)
    h, w = rows[0].shape[1:3]
    out = np.full(
        (len(rows) * (h + pad) + pad, n * (w + pad) + pad, 3), pad_value, np.uint8
    )
    for ri, row in enumerate(rows):
        for ci in range(row.shape[0]):
            y = pad + ri * (h + pad)
            x = pad + ci * (w + pad)
            out[y : y + h, x : x + w] = row[ci]
    return out


def _caption(img: np.ndarray, text: str) -> np.ndarray:
    if not text:
        return img
    try:
        from PIL import Image, ImageDraw

        im = Image.fromarray(img)
        band = Image.new("RGB", (im.width, 18), (255, 255, 255))
        full = Image.new("RGB", (im.width, im.height + 18))
        full.paste(band, (0, 0))
        full.paste(im, (0, 18))
        ImageDraw.Draw(full).text((4, 3), text[:120], fill=(0, 0, 0))
        return np.array(full)
    except Exception:
        return img


def _save(img: np.ndarray, path: str | Path) -> None:
    from PIL import Image

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(img).save(path)


def save_concept_grid(path, segs, preds, gts, prompt: str = "") -> None:
    """Rows: seg / prediction / ground truth (``save_concept_grid``)."""
    _save(_caption(make_grid([segs, preds, gts]), prompt), path)


def save_triplet_grid(path, seg, pred, gt, prompt: str = "") -> None:
    """One sample: seg|pred|gt side by side with prompt overlay (``save_triplet_grid``)."""
    row = np.stack([_to_u8(seg), _to_u8(pred), _to_u8(gt)])
    _save(_caption(make_grid([row]), prompt), path)


def save_ab_grid(path, segs, preds_a, preds_b, gts, preds_b0=None, prompt: str = "") -> None:
    """A/B(/B0) checkpoint comparison columns (``compare_model_results.save_ab_grid``)."""
    rows = [segs, preds_a, preds_b] + ([preds_b0] if preds_b0 is not None else []) + [gts]
    _save(_caption(make_grid(rows), prompt), path)


def save_abc_grid(path, segs, a, b, c, gts, prompt: str = "") -> None:
    """Three-fusion-mode comparison (``save_abc_grid``)."""
    _save(_caption(make_grid([segs, a, b, c, gts]), prompt), path)
