"""Quantitative evaluation metrics — formula-parity with the reference, batched jnp.

* ``mse_rgb`` / ``psnr_rgb`` / ``color_histogram_l1`` — ``quantitative_metrics.py:162-196``
  (images in 0-255; histogram uses 32 density-normalized bins per channel, L1 summed then
  averaged over channels).
* ``mean_iou`` — 9-class MIoU with class 8 remapped to 0 before scoring, matching
  ``evaluateCNSiegfried.calculate_MIOU`` (``:66-80``; its keras ``ignore_class=8`` is made
  moot by the remap — we reproduce the actual computation, remap included).
* ``siegfried_mask_mse`` — per-class weighted color MSE ``mask_check``
  (``evaluateCNSiegfried.py:83-129``): background/building/forest masks from the control
  image, expected Siegfried colors (240,238,223)/(16,17,13)/(240,238,223), weights = class
  area fractions. NOTE the reference compares expected color against ``pred·mask`` (zeros
  outside the mask) and nanmeans over ALL pixels — we reproduce that exactly, quirks and all,
  since parity is the point.
* LPIPS lives in ``topomap_tpu.train.losses``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mse_rgb(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error in 0-255 space. pred/gt [..., H, W, 3] float 0-255."""
    return jnp.mean((pred.astype(jnp.float32) - gt.astype(jnp.float32)) ** 2)


def psnr_rgb(pred: jnp.ndarray, gt: jnp.ndarray, data_range: float = 255.0) -> jnp.ndarray:
    """skimage-convention PSNR: ``10·log10(range² / mse)``."""
    mse = mse_rgb(pred, gt)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def color_histogram_l1(pred: jnp.ndarray, gt: jnp.ndarray, bins: int = 32) -> jnp.ndarray:
    """32-bin per-channel density-histogram L1, channel-averaged (``:179-195``).

    pred/gt [H, W, 3] float 0-255. numpy ``density=True`` normalizes so that
    ``sum(hist)·bin_width = 1`` → hist = count / (N·width).
    """
    width = 255.0 / bins
    edges = jnp.arange(1, bins) * width

    def hist(x):
        # digitize into [0, bins); values == 255 land in the last bin like np.histogram.
        idx = jnp.searchsorted(edges, x.reshape(-1), side="right")
        counts = jnp.zeros((bins,), jnp.float32).at[idx].add(1.0)
        return counts / (x.size * width)

    total = 0.0
    for ch in range(3):
        hp = hist(pred[..., ch].astype(jnp.float32))
        hg = hist(gt[..., ch].astype(jnp.float32))
        total = total + jnp.abs(hp - hg).sum()
    return total / 3.0


def mean_iou(
    pred_mask: jnp.ndarray, gt_mask: jnp.ndarray, num_classes: int = 9, remap_ignore: int | None = 8
) -> jnp.ndarray:
    """MIoU over integer class masks [..., H, W].

    Reference behavior (``calculate_MIOU``): class ``remap_ignore`` (8) is remapped to 0 in
    BOTH masks before scoring; mean is over classes present in the union (keras MeanIoU
    averages IoU over classes with nonzero denominator).
    """
    p = pred_mask.reshape(-1)
    g = gt_mask.reshape(-1)
    if remap_ignore is not None:
        p = jnp.where(p == remap_ignore, 0, p)
        g = jnp.where(g == remap_ignore, 0, g)
    conf = jnp.zeros((num_classes, num_classes), jnp.float32).at[g, p].add(1.0)
    inter = jnp.diag(conf)
    union = conf.sum(0) + conf.sum(1) - inter
    valid = union > 0
    iou = jnp.where(valid, inter / jnp.maximum(union, 1.0), 0.0)
    return iou.sum() / jnp.maximum(valid.sum(), 1)


# Expected Siegfried-style colors per class (``evaluateCNSiegfried.py:101-110``).
_SIEGFRIED_CHECKS = (
    ((255, 255, 255), (240.0, 238.0, 223.0)),  # background → parchment
    ((82, 82, 82), (16.0, 17.0, 13.0)),        # building → near-black
    ((77, 175, 74), (240.0, 238.0, 223.0)),    # forest → parchment
)


def siegfried_mask_mse(pred: jnp.ndarray, control: jnp.ndarray) -> jnp.ndarray:
    """``mask_check`` weighted per-class color MSE. pred/control [H,W,3] uint8/float 0-255.

    For each checked class: weight = fraction of control pixels exactly equal to the class
    color; score = mean over class pixels of (expected − pred·mask)² — reproduced with the
    reference's pred·mask semantics (pred is NOT masked-out-of-mean; zeros outside the mask
    never enter because expected is NaN there and nanmean drops them... in the reference the
    product ``pred*mask`` zeroes non-class pixels but nanmean over ``control_expected −
    pred*mask`` keeps ONLY class pixels, since control_expected is NaN elsewhere). Net
    effect: score = mean_{class px}(expected − pred)². Returns Σ weight·score.
    """
    pred = pred.astype(jnp.float32)
    control = control.astype(jnp.float32)
    n = pred.shape[0] * pred.shape[1]
    total = 0.0
    for class_rgb, expect_rgb in _SIEGFRIED_CHECKS:
        hit = jnp.all(control == jnp.asarray(class_rgb, jnp.float32), axis=-1)  # [H,W]
        weight = hit.mean()
        expect = jnp.asarray(expect_rgb, jnp.float32)
        sq = jnp.sum(jnp.where(hit[..., None], (expect - pred) ** 2, 0.0)) / jnp.maximum(
            hit.sum() * 3, 1.0
        )
        total = total + weight * sq
    return total


def best_of_n_vote(miou_scores: np.ndarray, mask_mse_scores: np.ndarray) -> int:
    """Best-of-N tile pick (``evaluateCNSiegfried.py:224-230``): if the best-MIoU candidate
    and the best-(lowest)-mask-MSE candidate agree, take it; otherwise MIoU wins."""
    best_miou = int(np.argmax(miou_scores))
    best_mse = int(np.argmin(mask_mse_scores))
    return best_miou if best_miou == best_mse else best_miou


def l1_01(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Image L1 in [0,1] space — ``validate_image_metrics`` (``vis_metrics.py:120-161``)."""
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - gt.astype(jnp.float32)))
