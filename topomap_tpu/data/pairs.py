"""pairs.jsonl datasets and stratified splits.

Re-implements the dataset layer of the reference (``TextEncoder_Finetuning/data_utils.py``):

* ``stratified_split`` — fixed per-prompt counts (``data_utils.py:9-44``),
* ``stratified_split_ratio`` — per-prompt ratios with rounding repair (``:47-128``),
* ``PairsJSONLDataset`` — ``{prompt, source, target}`` records with alias keys
  (``seg/seg_path/control`` and ``gt/gt_path``, ``:131-181``),
* ``RepeatDataset`` — overfit helper (``:184-203``).

TPU-first differences: the dataset yields **numpy batches** (host) that the training loop
feeds to jitted device functions; image decode is done once and optionally cached as VAE
latents (see ``topomap_tpu.data.latent_cache``). Transforms match the reference: seg hints
NEAREST-resized → [0,1]; gt rasters BILINEAR-resized → [−1,1] (``data_utils.py:160-169``).
"""
from __future__ import annotations

import dataclasses
import json
import random
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

_SEG_KEYS = ("source", "seg", "seg_path", "control")
_GT_KEYS = ("target", "gt", "gt_path")


@dataclasses.dataclass
class PairsRecord:
    prompt: str
    source: str  # path to seg-hint tile
    target: str  # path to gt raster tile

    @classmethod
    def from_json(cls, obj: dict) -> "PairsRecord":
        src = next((obj[k] for k in _SEG_KEYS if k in obj), None)
        tgt = next((obj[k] for k in _GT_KEYS if k in obj), None)
        if src is None or tgt is None:
            raise KeyError(f"pairs record missing source/target keys: {sorted(obj)}")
        return cls(prompt=obj.get("prompt", ""), source=src, target=tgt)

    def to_json(self) -> dict:
        return {"prompt": self.prompt, "source": self.source, "target": self.target}


def read_pairs_jsonl(path: str | Path) -> list[PairsRecord]:
    records = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(PairsRecord.from_json(json.loads(line)))
    return records


def write_pairs_jsonl(path: str | Path, records: Sequence[PairsRecord]) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for r in records:
            f.write(json.dumps(r.to_json()) + "\n")


def _group_by_prompt(records: Sequence[PairsRecord]) -> dict[str, list[PairsRecord]]:
    groups: dict[str, list[PairsRecord]] = {}
    for r in records:
        groups.setdefault(r.prompt, []).append(r)
    return groups


def stratified_split(
    records: Sequence[PairsRecord],
    per_prompt_counts: tuple[int, int, int] = (400, 50, 50),
    shuffle_seed: int = 42,
) -> tuple[list[PairsRecord], list[PairsRecord], list[PairsRecord]]:
    """Fixed-count per-prompt train/val/test split (``data_utils.py:9-44``)."""
    n_tr, n_va, n_te = per_prompt_counts
    rng = random.Random(shuffle_seed)
    train, val, test = [], [], []
    for _, items in sorted(_group_by_prompt(records).items()):
        items = list(items)
        rng.shuffle(items)
        train.extend(items[:n_tr])
        val.extend(items[n_tr : n_tr + n_va])
        test.extend(items[n_tr + n_va : n_tr + n_va + n_te])
    return train, val, test


def stratified_split_ratio(
    records: Sequence[PairsRecord],
    per_prompt_ratio: tuple[float, float, float] = (0.8, 0.1, 0.1),
    min_per_split: int = 1,
    shuffle_seed: int = 42,
) -> tuple[list[PairsRecord], list[PairsRecord], list[PairsRecord]]:
    """Ratio-based per-prompt split with rounding repair (``data_utils.py:47-128``).

    Semantics preserved from the reference: counts are rounded per split, any rounding
    remainder goes to train; prompt groups too small to give every split ``min_per_split``
    items go entirely to train.
    """
    r_tr, r_va, r_te = per_prompt_ratio
    assert abs(r_tr + r_va + r_te - 1.0) < 1e-6
    rng = random.Random(shuffle_seed)
    train, val, test = [], [], []
    for _, items in sorted(_group_by_prompt(records).items()):
        items = list(items)
        rng.shuffle(items)
        n = len(items)
        n_va = int(round(n * r_va))
        n_te = int(round(n * r_te))
        n_tr = n - n_va - n_te  # remainder → train
        if n_tr < min_per_split or n_va < min_per_split or n_te < min_per_split:
            train.extend(items)  # tiny prompt group → all train
            continue
        train.extend(items[:n_tr])
        val.extend(items[n_tr : n_tr + n_va])
        test.extend(items[n_tr + n_va :])
    return train, val, test


def _load_image(path: str) -> np.ndarray:
    """Decode an image file to uint8 HWC3. PNG/JPEG via PIL; ``.npy`` passthrough."""
    if path.endswith(".npy"):
        arr = np.load(path)
    else:
        from PIL import Image

        with Image.open(path) as im:
            arr = np.array(im.convert("RGB"))
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return arr[..., :3].astype(np.uint8)


class PairsDataset:
    """In-memory-indexable pairs dataset yielding numpy dicts.

    Item schema matches the reference ``PairsJSONLDataset.__getitem__``
    (``data_utils.py:150-181``): ``{prompt, seg [H,W,3] f32 in [0,1] (NEAREST),
    gt [H,W,3] f32 in [−1,1] (BILINEAR), seg_path, gt_path}``.
    """

    def __init__(self, records: Sequence[PairsRecord], size: int = 512, use_native: bool = True):
        self.records = list(records)
        self.size = size
        self.use_native = use_native

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> dict:
        r = self.records[idx]
        seg = _load_image(r.source)
        gt = _load_image(r.target)
        seg = _resize_np(seg, self.size, nearest=True).astype(np.float32) / 255.0
        gt = _resize_np(gt, self.size, nearest=False).astype(np.float32) / 127.5 - 1.0
        return {"prompt": r.prompt, "seg": seg, "gt": gt, "seg_path": r.source, "gt_path": r.target}

    def _load_batch(self, idxs) -> dict:
        recs = [self.records[int(j)] for j in idxs]
        if self.use_native:
            from topomap_tpu.data.native_loader import load_batch_native

            seg = load_batch_native([r.source for r in recs], self.size, "seg")
            gt = load_batch_native([r.target for r in recs], self.size, "gt")
            if seg is not None and gt is not None:
                return {"prompt": [r.prompt for r in recs], "seg": seg, "gt": gt}
        items = [self[int(j)] for j in idxs]
        return {
            "prompt": [it["prompt"] for it in items],
            "seg": np.stack([it["seg"] for it in items]),
            "gt": np.stack([it["gt"] for it in items]),
        }

    def iter_batches(
        self, batch_size: int, shuffle: bool = True, seed: int = 42, drop_remainder: bool = True
    ) -> Iterator[dict]:
        """Epoch-cycling batch iterator: ``{prompt: list[str], seg: [B,H,W,3], gt: [B,H,W,3]}``.

        Uses the native C++ batch loader (``topomap_tpu.data.native_loader``) when available,
        PIL otherwise."""
        epoch = 0
        while True:
            order = np.arange(len(self))
            if shuffle:
                np.random.default_rng(seed + epoch).shuffle(order)
            for i in range(0, len(order) - (batch_size - 1 if drop_remainder else 0), batch_size):
                yield self._load_batch(order[i : i + batch_size])
            epoch += 1


class RepeatDataset:
    """Repeat a dataset (or one item) N times — overfit helper (``data_utils.py:184-203``)."""

    def __init__(self, base, repeats: int):
        self.base = base
        self.repeats = repeats

    def __len__(self) -> int:
        return len(self.base) * self.repeats

    def __getitem__(self, idx: int):
        return self.base[idx % len(self.base)]


def _resize_np(img: np.ndarray, size: int, nearest: bool) -> np.ndarray:
    """Host-side resize for the data loader (PIL), matching torchvision semantics."""
    if img.shape[0] == size and img.shape[1] == size:
        return img
    from PIL import Image

    mode = Image.NEAREST if nearest else Image.BILINEAR
    return np.array(Image.fromarray(img).resize((size, size), mode))
