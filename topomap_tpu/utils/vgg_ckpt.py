"""torchvision-VGG16 → LPIPS-params keymap.

The reference's quality metric and perceptual loss use the ``lpips`` package with
pretrained VGG16 (``/root/reference/LoRA_modified/quantitative_metrics.py:162-196``:
``LPIPS(net="vgg")`` on [-1,1] images; ``/root/reference/experiment_overfit/
expand_steps_and_trainingdata.py:515-523``). This module converts

* a **torchvision VGG16** state dict (``features.{i}.weight/bias``, torch OIHW conv
  layout) into the ``train/losses.py: lpips_init`` pytree structure (HWIO), and
* optionally the **lpips package's** learned per-stage 1×1 linear heads
  (``lin{k}.model.1.weight``, the 'lin' calibration of the LPIPS paper).

With converted weights, ``lpips_distance`` reproduces the reference LPIPS math exactly
(scaling layer → VGG slices → unit-normalize → squared diff → 1×1 head → spatial mean →
sum over stages); without the lin heads it falls back to uniform 1/C channel averaging —
the paper's "baseline" variant. Parity vs a torch twin is asserted in
``tests/test_torch_parity.py``. Without any pretrained file, ``lpips_init``'s
seeded-random features remain the documented fallback (reported as ``lpips_rand``).
"""
from __future__ import annotations

from typing import Any, Mapping, Optional

import numpy as np

Params = dict[str, Any]

# torchvision.models.vgg16().features conv indices, grouped by LPIPS slice
# (relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3 — features taken after the final
# ReLU of each group, before the MaxPool).
VGG16_FEATURE_IDX = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]

# lpips.ScalingLayer constants: applied to [-1,1] inputs as (x - shift) / scale.
LPIPS_SHIFT = (-0.030, -0.088, -0.188)
LPIPS_SCALE = (0.458, 0.448, 0.450)


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _lookup(state: Mapping[str, Any], suffix: str):
    """Find the unique key ending in ``suffix`` (tolerates ``vgg.``/``net.`` prefixes)."""
    if suffix in state:
        return state[suffix]
    hits = [k for k in state if k.endswith("." + suffix) or k == suffix]
    if len(hits) != 1:
        raise KeyError(f"expected exactly one key matching *{suffix}, got {hits}")
    return state[hits[0]]


def import_vgg16_lpips(
    vgg_state: Mapping[str, Any], lin_state: Optional[Mapping[str, Any]] = None
) -> Params:
    """Build ``lpips_distance`` params from a torchvision VGG16 state dict.

    ``vgg_state``: mapping with ``features.{i}.weight``/``.bias`` entries (torch tensors
    or arrays, OIHW). ``lin_state``: optional lpips-package checkpoint with
    ``lin{k}.model.1.weight`` ([1, C, 1, 1]) learned head weights.
    """
    import jax.numpy as jnp

    stages, heads = [], []
    for k, idxs in enumerate(VGG16_FEATURE_IDX):
        convs = []
        for i in idxs:
            w = _to_np(_lookup(vgg_state, f"features.{i}.weight"))  # [O, I, kh, kw]
            b = _to_np(_lookup(vgg_state, f"features.{i}.bias"))
            convs.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)})
        stages.append(convs)
        c_out = convs[-1]["w"].shape[-1]
        if lin_state is not None:
            lw = _to_np(_lookup(lin_state, f"lin{k}.model.1.weight"))  # [1, C, 1, 1]
            if lw.shape != (1, c_out, 1, 1):
                raise ValueError(f"lin{k} head shape {lw.shape} != (1, {c_out}, 1, 1)")
            hw = lw.transpose(2, 3, 1, 0)  # HWIO [1, 1, C, 1]
        else:
            hw = np.full((1, 1, c_out, 1), 1.0 / c_out, np.float32)  # uniform baseline
        heads.append({"w": jnp.asarray(hw), "b": jnp.zeros((1,), jnp.float32)})
    return {
        "stages": stages,
        "heads": heads,
        "shift": jnp.asarray(LPIPS_SHIFT, jnp.float32),
        "scale": jnp.asarray(LPIPS_SCALE, jnp.float32),
    }


def load_vgg16_lpips(vgg_path: str, lin_path: Optional[str] = None) -> Params:
    """Load from ``.pth`` files (torch serialization; CPU)."""
    import torch

    def _load(p):
        try:
            obj = torch.load(p, map_location="cpu", weights_only=True)
        except TypeError:  # older torch without weights_only
            obj = torch.load(p, map_location="cpu")
        return obj.get("state_dict", obj) if isinstance(obj, dict) else obj

    return import_vgg16_lpips(_load(vgg_path), _load(lin_path) if lin_path else None)
