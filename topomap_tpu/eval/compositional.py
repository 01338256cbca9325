"""Compositional-prompt inference testing — ``LoRA_modified/combinated_prompt_test.py``.

The reference probes whether a trained config-3 model generalizes to prompts combining TWO
style instructions it never saw together ("Render Tree as a small triangle-shaped mark
symbol, Render Forest with a diagonal hatch fill texture"; ``:144-165``), sampling each with
``model.sample_log`` (DDIM 15, ``:197-204``). Here: a default composed-prompt suite, batched
sampling over a set of seg tiles, and a labeled grid output.
"""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from topomap_tpu.core import DiffusionSchedule
from topomap_tpu.eval.grids import make_grid, _caption, _save
from topomap_tpu.eval.sampling import sample_preview
from topomap_tpu.ops.image import from_signed
from topomap_tpu.pipeline import PipelineConfig, Params

# Composed two-instruction prompts in the reference's grammar (``:144-165``).
COMPOSED_PROMPTS = [
    "Render Tree as a small triangle-shaped mark symbol, Render Forest with a diagonal hatch fill texture",
    "Set Forest color to dark green, Set Lake color to turquoise",
    "Set Building color to red, Render Road as a dashed line pattern",
    "Set Background color to beige, Make Stream hidden",
    "Render River in bold outline style, Set Forest color to olive",
]


def sample_compositional(
    params: Params,
    cfg: PipelineConfig,
    sched: DiffusionSchedule,
    tokenizer,
    seg: jnp.ndarray,
    prompts: list[str] | None = None,
    steps: int = 15,
    scale: float = 7.5,
    seed: int = 1234,
    out_png: str | Path | None = None,
) -> dict[str, np.ndarray]:
    """Sample every composed prompt on the same seg tile(s).

    seg: [B,H,W,3] in [0,1]. Returns {prompt: [B,H,W,3] uint8}; optionally writes a grid
    with one row per prompt.
    """
    prompts = prompts or COMPOSED_PROMPTS
    outputs: dict[str, np.ndarray] = {}
    rows = [np.asarray(np.clip(seg * 255, 0, 255), np.uint8)]
    for prompt in prompts:
        ids, mask = tokenizer.encode([prompt] * seg.shape[0])
        batch = {"seg": seg, "ids": jnp.asarray(ids), "mask": jnp.asarray(mask)}
        img = sample_preview(params, cfg, sched, batch, steps=steps, scale=scale, seed=seed)
        outputs[prompt] = np.asarray(from_signed(img))
        rows.append(outputs[prompt])
    if out_png is not None:
        _save(_caption(make_grid(rows), " | ".join(p[:30] for p in prompts)), out_png)
    return outputs
