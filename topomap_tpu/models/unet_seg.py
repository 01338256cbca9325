"""9-class segmentation U-Net — the MIoU evaluation model.

The reference evaluates Siegfried-style generations with a Keras ``multi_unet_model`` (9
classes, ``segmentationModelSiegfried.weights.h5``, ``BaseModel/evaluateCNSiegfried.py:31-36``)
whose weights are external (Google Drive). This is the same standard U-Net topology —
4 down / 4 up levels, 16→256 channels, 3×3 double-conv blocks, softmax head — as a functional
JAX model, plus a training step (pixel cross-entropy against ``createMask``-style class masks)
so the evaluator can be (re)trained from tiles when the external weights are unavailable
(SURVEY.md §7 risk list).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from topomap_tpu.models.nn import KeyGen, Params, conv, conv_init

NUM_CLASSES = 9


@dataclasses.dataclass(frozen=True)
class SegUNetConfig:
    base_channels: int = 16
    levels: int = 4          # downsample count; Keras model: 16,32,64,128 down + 256 bottleneck
    num_classes: int = NUM_CLASSES

    @staticmethod
    def tiny() -> "SegUNetConfig":
        return SegUNetConfig(base_channels=4, levels=2)


def _block_init(kg: KeyGen, c_in: int, c_out: int) -> Params:
    return {"c1": conv_init(kg(), c_in, c_out, 3), "c2": conv_init(kg(), c_out, c_out, 3)}


def _block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = jax.nn.relu(conv(p["c1"], x))
    return jax.nn.relu(conv(p["c2"], x))


def seg_unet_init(key, cfg: SegUNetConfig = SegUNetConfig()) -> Params:
    kg = KeyGen(key)
    downs, ups = [], []
    ch = 3
    enc_chs = []
    for li in range(cfg.levels):
        out = cfg.base_channels * (2**li)
        downs.append(_block_init(kg, ch, out))
        enc_chs.append(out)
        ch = out
    mid = cfg.base_channels * (2**cfg.levels)
    bottleneck = _block_init(kg, ch, mid)
    ch = mid
    for li in reversed(range(cfg.levels)):
        out = cfg.base_channels * (2**li)
        ups.append(
            {"up": conv_init(kg(), ch, out, 2), "block": _block_init(kg, out + enc_chs[li], out)}
        )
        ch = out
    return {"downs": downs, "bottleneck": bottleneck, "ups": ups, "head": conv_init(kg(), ch, cfg.num_classes, 1)}


def _maxpool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def conv_transpose_2x2(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Keras ``Conv2DTranspose(k=2, strides=2, padding='same')`` semantics: each input
    pixel expands into an independent 2×2 output block. Implemented as a lhs-dilated conv
    with the spatially-flipped kernel (weights stored HWIO like every other conv here)."""
    w = p["w"][::-1, ::-1]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def seg_unet_apply(p: Params, cfg: SegUNetConfig, img: jnp.ndarray) -> jnp.ndarray:
    """img [B,H,W,3] in [0,1] → class logits [B,H,W,9]."""
    skips = []
    h = img
    for dp in p["downs"]:
        h = _block(dp, h)
        skips.append(h)
        h = _maxpool(h)
    h = _block(p["bottleneck"], h)
    for up in p["ups"]:
        if "upt" in up:  # keras-imported Conv2DTranspose upsampling (utils/keras_ckpt.py)
            h = conv_transpose_2x2(up["upt"], h)
        else:
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            h = conv(up["up"], h)
        h = _block(up["block"], jnp.concatenate([h, skips.pop()], axis=-1))
    return conv(p["head"], h)


def predict_classes(p: Params, cfg: SegUNetConfig, img: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(seg_unet_apply(p, cfg, img), axis=-1)


def seg_loss(p: Params, cfg: SegUNetConfig, img: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Pixel cross-entropy; class 8 ('ignore') is excluded from the loss — the counterpart
    of keras ``MeanIoU(ignore_class=8)`` on the eval side."""
    logits = seg_unet_apply(p, cfg, img)
    ll = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(mask, cfg.num_classes)
    valid = (mask != 8).astype(jnp.float32)
    ce = -(onehot * ll).sum(-1) * valid
    return ce.sum() / jnp.maximum(valid.sum(), 1.0)


# Default on-disk home of the trained stand-in (CLI `train-seg` writes it; `best-of-n` /
# `evaluate` pick it up automatically when present — the reference instead ships external
# Keras weights, ``evaluateCNSiegfried.py:31-36``).
DEFAULT_SEG_WEIGHTS = "runs/seg_unet/seg_unet.npz"


def save_seg_weights(path, params: Params) -> None:
    import numpy as np

    from topomap_tpu.utils.checkpoint import _flatten

    from pathlib import Path

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **_flatten(params))


def load_seg_weights(path, cfg: SegUNetConfig = SegUNetConfig()) -> Params:
    import numpy as np

    from topomap_tpu.utils.checkpoint import _unflatten_into

    template = seg_unet_init(jax.random.PRNGKey(0), cfg)
    return _unflatten_into(template, dict(np.load(path)))


def make_seg_train_step(cfg: SegUNetConfig, tx: optax.GradientTransformation):
    def step(params, opt_state, img, mask):
        loss, grads = jax.value_and_grad(lambda p: seg_loss(p, cfg, img, mask))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step)
