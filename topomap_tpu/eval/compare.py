"""A/B(/B0) checkpoint comparison — ``TextEncoder_Finetuning/compare_model_results.py``.

The reference rebuilds a model per checkpoint by runtime-monkey-patching LoRA into Linears
and inferring ranks from checkpoint tensor shapes (``:49-107``), then renders 4-5-column
comparison grids (``save_ab_grid``, ``:289-335``). Functionally that becomes: overlay each
filtered checkpoint onto the base collections, infer the LoRASpec from the stored A-matrix
shapes, and sample each variant with identical seeds.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from topomap_tpu.core import DiffusionSchedule
from topomap_tpu.eval.grids import save_ab_grid
from topomap_tpu.eval.sampling import sample_preview
from topomap_tpu.ops.image import from_signed
from topomap_tpu.pipeline import PipelineConfig, Params
from topomap_tpu.utils.checkpoint import load_filtered


def infer_lora_ranks(flat_ckpt: dict[str, np.ndarray]) -> dict[str, int]:
    """Rank inference from checkpoint shapes (``compare_model_results.py:70-107``): every
    ``.../A`` tensor [d_in, r] reveals its rank. Returns {projection name: rank} (first
    occurrence per projection kind)."""
    ranks: dict[str, int] = {}
    for key, val in flat_ckpt.items():
        parts = key.split("/")
        if parts[-1] == "A" and val.ndim == 2:
            proj = parts[-2]  # to_q / to_k / to_v / to_out / proj_in / proj_out
            ranks.setdefault(proj, int(val.shape[1]))
    return ranks


def load_variant(params: Params, ckpt_dir: str | Path, step: int) -> Params:
    """Overlay one run's filtered checkpoints (adapter / ctrl_lora / unet_lora) at ``step``."""
    ckpt_dir = Path(ckpt_dir)
    out = dict(params)
    for coll in ("adapter", "ctrl_lora", "unet_lora"):
        path = ckpt_dir / f"{coll}_step{step}.npz"
        if path.exists() and coll in out:
            out = load_filtered(out, path, coll)
    return out


def compare_runs(
    base_params: Params,
    cfg: PipelineConfig,
    sched: DiffusionSchedule,
    batch: dict,
    variants: dict[str, tuple[str, int]],  # label -> (ckpt_dir, step)
    out_png: str | Path | None = None,
    steps: int = 12,
    scale: float = 7.5,
    seed: int = 1234,
) -> dict[str, np.ndarray]:
    """Sample every variant on the same batch/seed; optionally write the A/B grid.

    Returns {label: [B,H,W,3] uint8}."""
    outputs: dict[str, np.ndarray] = {}
    for label, (ckpt_dir, step) in variants.items():
        p = load_variant(base_params, ckpt_dir, step)
        img = sample_preview(p, cfg, sched, batch, steps=steps, scale=scale, seed=seed)
        outputs[label] = np.asarray(from_signed(img))
    if out_png is not None and len(outputs) >= 2:
        labels = list(outputs)
        seg_u8 = np.asarray(np.clip(batch["seg"] * 255, 0, 255), np.uint8)
        gt_u8 = (
            np.asarray(np.clip((batch["gt"] + 1) * 127.5, 0, 255), np.uint8)
            if "gt" in batch
            else np.zeros_like(seg_u8)
        )
        save_ab_grid(
            out_png,
            seg_u8,
            outputs[labels[0]],
            outputs[labels[1]],
            gt_u8,
            preds_b0=outputs[labels[2]] if len(labels) > 2 else None,
            prompt=" vs ".join(labels),
        )
    return outputs
