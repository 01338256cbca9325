"""Synthetic map-tile generator for self-contained tests and benchmarks.

The reference's training data is external (QGIS-rendered Swiss vector tiles + Google-Drive
checkpoints, ``BaseModel/README.docx``; renderer ``PromptEngineering/empty_prompt_data_creation.py``).
This module generates structurally similar 512² source/target pairs entirely on the host with
numpy: a random arrangement of lakes, forests, roads, streams, buildings and paths painted in
the exact class palette of ``BaseModel/createMask.py:33-81``, plus a deterministic per-prompt
restyling of the target so that overfit tests have a learnable seg+prompt → image mapping.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from topomap_tpu.data.pairs import PairsRecord, write_pairs_jsonl

# Train-palette colors (createMask.py:33-81).
CLASS_COLORS = {
    "lake": (55, 126, 184),
    "forest": (77, 175, 74),
    "stream": (63, 96, 132),
    "roads": (149, 74, 162),
    "background": (255, 255, 255),
    "building": (5, 5, 5),
    "river": (96, 147, 201),
    "paths": (255, 0, 0),
}

# Style-prompt suite in the spirit of the reference's 19-prompt Element_Styling set
# (e.g. "Set Forest color to dark green", "Render Road as a dashed line pattern").
STYLE_PROMPTS = {
    "": {},
    "Set Forest color to dark green": {"forest": (20, 90, 30)},
    "Set Forest color to olive": {"forest": (128, 128, 0)},
    "Set Lake color to turquoise": {"lake": (64, 224, 208)},
    "Set Lake color to navy blue": {"lake": (20, 30, 120)},
    "Set Building color to red": {"building": (200, 30, 30)},
    "Set Building color to gray": {"building": (120, 120, 120)},
    "Set Road color to black": {"roads": (10, 10, 10)},
    "Set Road color to orange": {"roads": (255, 140, 0)},
    "Set Background color to beige": {"background": (245, 235, 200)},
}


@dataclasses.dataclass(frozen=True)
class SyntheticTileConfig:
    size: int = 512
    n_blobs: int = 6       # lakes/forests
    n_lines: int = 5       # roads/streams/paths
    n_buildings: int = 10


def _paint_blob(img: np.ndarray, rng: np.random.Generator, color, size: int) -> None:
    cy, cx = rng.integers(0, size, 2)
    ry, rx = rng.integers(size // 16, size // 4, 2)
    yy, xx = np.ogrid[:size, :size]
    mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    img[mask] = color


def _paint_line(img: np.ndarray, rng: np.random.Generator, color, size: int, width: int) -> None:
    # Axis-aligned-ish polyline: a thick line from one edge to another.
    x0, x1 = rng.integers(0, size, 2)
    horizontal = bool(rng.integers(0, 2))
    t = np.linspace(0.0, 1.0, size)
    pos = (x0 * (1 - t) + x1 * t).astype(int)
    for d in range(-width // 2, width // 2 + 1):
        p = np.clip(pos + d, 0, size - 1)
        if horizontal:
            img[np.arange(size), p] = color
        else:
            img[p, np.arange(size)] = color


def _paint_building(img: np.ndarray, rng: np.random.Generator, color, size: int) -> None:
    h, w = rng.integers(size // 40, size // 10, 2)
    y, x = rng.integers(0, size - 1, 2)
    img[y : min(y + h, size), x : min(x + w, size)] = color


def generate_seg_tile(seed: int, cfg: SyntheticTileConfig = SyntheticTileConfig()) -> np.ndarray:
    """One synthetic 512² vector-style seg tile, uint8 HWC3 in the exact class palette."""
    rng = np.random.default_rng(seed)
    s = cfg.size
    img = np.full((s, s, 3), CLASS_COLORS["background"], np.uint8)
    for _ in range(cfg.n_blobs):
        kind = ["forest", "lake"][int(rng.integers(0, 2))]
        _paint_blob(img, rng, CLASS_COLORS[kind], s)
    for _ in range(cfg.n_lines):
        kind = ["roads", "stream", "river", "paths"][int(rng.integers(0, 4))]
        width = {"roads": 5, "stream": 3, "river": 7, "paths": 2}[kind]
        _paint_line(img, rng, CLASS_COLORS[kind], s, width)
    for _ in range(cfg.n_buildings):
        _paint_building(img, rng, CLASS_COLORS["building"], s)
    return img


def apply_style(seg: np.ndarray, prompt: str) -> np.ndarray:
    """Deterministically restyle a seg tile per prompt — the synthetic 'ground truth' raster."""
    recolor = STYLE_PROMPTS.get(prompt, {})
    out = seg.copy()
    for cls, new_rgb in recolor.items():
        hit = np.all(seg == np.asarray(CLASS_COLORS[cls], np.uint8), axis=-1)
        out[hit] = new_rgb
    return out


def generate_pair(seed: int, prompt: str, cfg: SyntheticTileConfig = SyntheticTileConfig()):
    """Return (seg_u8, gt_u8) for one tile+prompt."""
    seg = generate_seg_tile(seed, cfg)
    return seg, apply_style(seg, prompt)


def generate_pairs_dataset(
    out_dir: str | Path,
    n_tiles: int = 8,
    prompts: list[str] | None = None,
    cfg: SyntheticTileConfig = SyntheticTileConfig(),
    seed: int = 0,
) -> list[PairsRecord]:
    """Write a small on-disk pairs dataset (PNG tiles + pairs.jsonl) and return the records."""
    from PIL import Image

    out_dir = Path(out_dir)
    (out_dir / "source").mkdir(parents=True, exist_ok=True)
    (out_dir / "target").mkdir(parents=True, exist_ok=True)
    prompts = list(STYLE_PROMPTS) if prompts is None else prompts
    records = []
    for i in range(n_tiles):
        for j, prompt in enumerate(prompts):
            seg, gt = generate_pair(seed + i, prompt, cfg)
            sp = out_dir / "source" / f"tile{i:04d}.png"
            tp = out_dir / "target" / f"tile{i:04d}_p{j:02d}.png"
            if not sp.exists():
                Image.fromarray(seg).save(sp)
            Image.fromarray(gt).save(tp)
            records.append(PairsRecord(prompt=prompt, source=str(sp), target=str(tp)))
    write_pairs_jsonl(out_dir / "pairs.jsonl", records)
    return records
