"""Optimizer assembly: trainability masks, per-group LRs, warmup→cosine→floor schedules.

The reference builds AdamW with hand-selected param lists and per-group LRs, then mutates
``opt.param_groups[i]["lr"]`` every step (``addlrSD.py:316-372``). Here the same capability is
declarative: a **trainable-path predicate** per experiment config produces an optax
``multi_transform`` label tree, and the LR schedules are pure functions of the step — which is
what makes the whole train step one jitted, pjit-shardable function.

Config → trainable sets (SURVEY.md §2.5):
* config 1 (onlyCNLora): ctrlora LoRA params + BERT adapter (``onlyCNLora.py:244-262``).
* config 2 (ctrlora): + ControlNet zero_convs / middle_block_out / norm leaves
  (``ctrlora.py:250-258``).
* config 3 (addlrSD): config 2 + main-UNet LoRA (``addlrSD.py:316-351``).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import optax

Params = dict[str, Any]

# ---------------------------------------------------------------------------
# LR schedule — warmup to base, cosine decay to floor (addlrSD.py:355-372)
# ---------------------------------------------------------------------------


def warmup_cosine_floor(
    base_lr: float,
    warmup: int,
    total: int,
    floor: float = 5e-6,
    warmup_start_frac: float = 0.1,
) -> optax.Schedule:
    """``scale = max(0.1, min(1, step/warmup))`` during warmup; then
    ``max(floor, base·½(1+cos(π·t)))`` with ``t=(step−warmup)/(total−warmup)``."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        wu = base_lr * jnp.clip(step / max(warmup, 1), warmup_start_frac, 1.0)
        t = jnp.clip((step - warmup) / max(1, total - warmup), 0.0, 1.0)
        cos = jnp.maximum(floor, base_lr * 0.5 * (1.0 + jnp.cos(math.pi * t)))
        return jnp.where(step < warmup, wu, cos)

    return schedule


# ---------------------------------------------------------------------------
# Trainability predicates
# ---------------------------------------------------------------------------


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


PathPredicate = Callable[[str], str | None]  # path -> group label (None = frozen)


def config1_labeler(path: str) -> str | None:
    """onlyCNLora: ctrlora LoRA + adapter."""
    if path.startswith("ctrl_lora/"):
        return "ctrl_lora"
    if path.startswith("adapter/"):
        return "adapter"
    return None


def config2_labeler(path: str) -> str | None:
    """ctrlora: config 1 + ControlNet zero_convs/middle_block_out/norm leaves."""
    g = config1_labeler(path)
    if g:
        return g
    if path.startswith("controlnet/") and (
        "zero_convs" in path or "middle_block_out" in path or "norm" in path
    ):
        return "ctrl_ft"
    return None


def config3_labeler(path: str) -> str | None:
    """addlrSD: config 2 + main-UNet LoRA."""
    g = config2_labeler(path)
    if g:
        return g
    if path.startswith("unet_lora/"):
        return "unet_lora"
    return None


def adapter_only_labeler(path: str) -> str | None:
    """TextEncoder_Finetuning regime: only the adapter trains (+ optional kv LoRA via
    unet_lora collection when present)."""
    if path.startswith("adapter/"):
        return "adapter"
    if path.startswith("unet_lora/"):
        return "unet_lora"
    return None


LABELERS = {
    "config1": config1_labeler,
    "config2": config2_labeler,
    "config3": config3_labeler,
    "adapter_only": adapter_only_labeler,
}

# Per-group base LRs per config (SURVEY.md §2.5 hyper table).
GROUP_LRS = {
    "config1": {"ctrl_lora": 3e-5, "adapter": 5e-5},
    "config2": {"ctrl_lora": 7e-5, "ctrl_ft": 7e-5, "adapter": 1e-5},
    "config3": {"ctrl_lora": 2e-5, "ctrl_ft": 2e-5, "unet_lora": 5e-5, "adapter": 5e-5},
    "adapter_only": {"adapter": 5e-5, "unet_lora": 1e-4},
}


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    config_name: str = "config3"
    total_steps: int = 150_000
    warmup: int = 15_000
    lr_floor: float = 5e-6
    grad_clip: float = 1.0
    weight_decay: float = 0.01
    lr_overrides: dict | None = None  # group -> lr


def label_params(params: Params, labeler: PathPredicate) -> Params:
    """Label tree for optax.multi_transform; frozen params get label 'frozen'."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [labeler(_path_str(p)) or "frozen" for p, _ in flat],
    )


def trainable_mask(params: Params, labeler: PathPredicate) -> Params:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [labeler(_path_str(p)) is not None for p, _ in flat],
    )


def count_trainable(params: Params, labeler: PathPredicate) -> int:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return sum(x.size for p, x in flat if labeler(_path_str(p)) is not None)


def build_optimizer(params: Params, cfg: OptimConfig) -> tuple[optax.GradientTransformation, Params]:
    """Returns (tx, label_tree). Grad-clip 1.0 → per-group AdamW with its own
    warmup-cosine-floor schedule; frozen params get zero updates."""
    labeler = LABELERS[cfg.config_name]
    lrs = dict(GROUP_LRS[cfg.config_name])
    if cfg.lr_overrides:
        lrs.update(cfg.lr_overrides)
    labels = label_params(params, labeler)

    transforms = {
        group: optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(
                warmup_cosine_floor(lr, cfg.warmup, cfg.total_steps, cfg.lr_floor),
                weight_decay=cfg.weight_decay,
            ),
        )
        for group, lr in lrs.items()
    }
    transforms["frozen"] = optax.set_to_zero()
    return optax.multi_transform(transforms, labels), labels
