"""Keras → JAX weights import for the Siegfried segmentation U-Net.

The reference scores Siegfried-style generations with a Keras ``multi_unet_model`` (the
standard 4-down/4-up 16→256-channel U-Net) loaded from external weights
(``segmentationModelSiegfried.weights.h5``, ``BaseModel/evaluateCNSiegfried.py:31-36``;
``Unet.py`` itself is one of the reference's absent vendored files). This module lets those
exact weights drive :mod:`topomap_tpu.models.unet_seg` so the MIoU leg of the best-of-N vote
(``evaluateCNSiegfried.py:66-80``) reproduces the reference scoring bit-for-bit.

Weight-list convention (``keras_model.get_weights()`` order for the functional
``multi_unet_model``; Dropout layers carry no variables):

* 5 double-conv blocks (4 downs + bottleneck): (w, b) × 2 each → 20 arrays
* 4 up stages: Conv2DTranspose (w, b) + double conv (w, b) × 2 → 24 arrays
* 1×1 softmax head: (w, b) → 2 arrays — 46 total.

Keras Conv2D kernels are HWIO (ours too). Conv2DTranspose kernels are [kh, kw, c_out, c_in]
and are stored transposed to HWIO; the forward flip happens in
``unet_seg.conv_transpose_2x2``.
"""
from __future__ import annotations

import re
from pathlib import Path
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from topomap_tpu.models.unet_seg import Params, SegUNetConfig


def import_keras_seg_unet(
    weights: Sequence[np.ndarray] | str | Path, cfg: SegUNetConfig = SegUNetConfig()
) -> Params:
    """Build a ``seg_unet_apply``-compatible param tree from keras multi_unet weights.

    ``weights``: a ``model.get_weights()`` list, or a path to a keras-3
    ``.weights.h5`` file (parsed with h5py).
    """
    if isinstance(weights, (str, Path)):
        weights = read_keras_weights_h5(weights)
    ws = [np.asarray(w) for w in weights]
    expected = (cfg.levels + 1) * 4 + cfg.levels * 6 + 2
    if len(ws) != expected:
        raise ValueError(f"expected {expected} weight arrays for {cfg}, got {len(ws)}")

    def take_conv():
        w, b = ws.pop(0), ws.pop(0)
        return {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    downs = [{"c1": take_conv(), "c2": take_conv()} for _ in range(cfg.levels)]
    bottleneck = {"c1": take_conv(), "c2": take_conv()}
    ups = []
    for _ in range(cfg.levels):
        wt, bt = ws.pop(0), ws.pop(0)
        upt = {"w": jnp.asarray(np.transpose(wt, (0, 1, 3, 2))), "b": jnp.asarray(bt)}
        ups.append({"upt": upt, "block": {"c1": take_conv(), "c2": take_conv()}})
    head = take_conv()
    assert not ws
    return {"downs": downs, "bottleneck": bottleneck, "ups": ups, "head": head}


def read_keras_weights_h5(path: str | Path) -> list[np.ndarray]:
    """Read a keras-3 ``.weights.h5`` into ``get_weights()`` order.

    Keras 3 stores per-layer groups under ``/layers/<name>/vars/{0,1}``. Creation order is
    recovered from the default layer names (``conv2d``, ``conv2d_1``, …,
    ``conv2d_transpose``, …) and the fixed topology of ``multi_unet_model``: convs 0–9 are
    the five double-conv blocks, then each up stage is (transpose i, convs 10+2i, 11+2i),
    and the last conv is the head.
    """
    import h5py

    def name_index(name: str, kind: str) -> int:
        m = re.fullmatch(rf"{kind}(?:_(\d+))?", name)
        return int(m.group(1)) if m and m.group(1) else 0

    convs: dict[int, list[np.ndarray]] = {}
    transposes: dict[int, list[np.ndarray]] = {}
    with h5py.File(path, "r") as f:
        layers = f["layers"] if "layers" in f else f["_layer_checkpoint_dependencies"]
        for name in layers:
            grp = layers[name]
            if "vars" not in grp or len(grp["vars"]) == 0:
                continue
            vars_ = [np.asarray(grp["vars"][k]) for k in sorted(grp["vars"], key=int)]
            if name.startswith("conv2d_transpose"):
                transposes[name_index(name, "conv2d_transpose")] = vars_
            elif name.startswith("conv2d"):
                convs[name_index(name, "conv2d")] = vars_

    n_levels = len(transposes)
    n_blocks = n_levels + 1
    out: list[np.ndarray] = []
    for i in range(2 * n_blocks):  # down + bottleneck convs, creation order
        out.extend(convs[i])
    for i in range(n_levels):
        out.extend(transposes[i])
        out.extend(convs[2 * n_blocks + 2 * i])
        out.extend(convs[2 * n_blocks + 2 * i + 1])
    out.extend(convs[2 * n_blocks + 2 * n_levels])  # head
    return out
