"""Best-of-N Siegfried-style evaluation & generation — ``BaseModel/evaluateCNSiegfried.py``.

The reference generates ``num_samples=6`` candidates per tile (``:49``), scores each with
(a) MIoU of a 9-class U-Net segmentation against the GT mask (``:66-80``) and (b) the
weighted per-class color MSE ``mask_check`` (``:83-129``), then picks the best by the
agreement rule (``:224-230``). Here the N candidates are ONE batched DDIM call (the
candidate axis folds into the batch), scoring is jnp, and the vote comes from
``topomap_tpu.eval.metrics.best_of_n_vote``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.core import DDIMConfig, DiffusionSchedule
from topomap_tpu.eval.metrics import best_of_n_vote, mean_iou, siegfried_mask_mse
from topomap_tpu.models.unet_seg import SegUNetConfig, predict_classes
from topomap_tpu.ops.image import from_signed, rgb_to_class_mask, PALETTE_EVAL
from topomap_tpu.pipeline import PipelineConfig, Params, sample


def generate_best_of_n(
    params: Params,
    cfg: PipelineConfig,
    sched: DiffusionSchedule,
    seg: jnp.ndarray,
    crossattn: jnp.ndarray,
    seg_model: tuple[Params, SegUNetConfig] | None = None,
    num_samples: int = 6,
    steps: int = 20,
    scale: float = 9.0,
    seed: int = 42,
    control_scales=None,
    attn_fn=None,
) -> tuple[np.ndarray, dict]:
    """Best-of-N for ONE tile. seg [1,H,W,3] in [0,1]; crossattn [1,T,D].

    Returns (chosen tile uint8 [H,W,3], report with per-candidate scores).
    When ``seg_model`` is None the MIoU leg falls back to palette-matching the generated
    tile directly (exact-color mask), which preserves the vote mechanics without the
    external U-Net weights.
    """

    from topomap_tpu.ops.flash_attention import best_attention_fn
    attn_fn = attn_fn or best_attention_fn()
    n = num_samples
    seg_n = jnp.tile(seg, (n, 1, 1, 1))
    ctx_n = jnp.tile(crossattn, (n, 1, 1))
    imgs = sample(
        params,
        cfg,
        sched,
        DDIMConfig(num_steps=steps, guidance_scale=scale),
        jax.random.PRNGKey(seed),
        seg_n,
        ctx_n,
        control_scales=control_scales,
        attn_fn=attn_fn,
    )
    tiles = from_signed(imgs)  # [n,H,W,3] uint8

    control_u8 = jnp.round(seg[0] * 255.0).astype(jnp.uint8)
    gt_mask = rgb_to_class_mask(control_u8, palette=PALETTE_EVAL)

    miou_scores, mse_scores = [], []
    for i in range(n):
        if seg_model is not None:
            sp, scfg = seg_model
            pred_mask = predict_classes(sp, scfg, tiles[i][None].astype(jnp.float32) / 255.0)[0]
        else:
            pred_mask = rgb_to_class_mask(tiles[i], palette=PALETTE_EVAL)
        miou_scores.append(float(mean_iou(pred_mask, gt_mask)))
        mse_scores.append(float(siegfried_mask_mse(tiles[i].astype(jnp.float32), control_u8.astype(jnp.float32))))

    pick = best_of_n_vote(np.asarray(miou_scores), np.asarray(mse_scores))
    report = {
        "miou": miou_scores,
        "mask_mse": mse_scores,
        "picked": pick,
        "avg_miou": float(np.mean(miou_scores)),
        "avg_mask_mse": float(np.mean(mse_scores)),
    }
    return np.asarray(tiles[pick]), report
