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


def bert_last_layer_labeler(path: str) -> str | None:
    """TextEncoder FT variant: unfreeze the LAST BERT layer's FFN (intermediate.dense +
    output.dense + output.LayerNorm ⇒ our mlp.fc1/fc2 + ln2) instead of the adapter
    (``Training_sdfusion_bert.py:118-133``); + optional unet kv-LoRA collection."""
    if path.startswith("bert/layers/"):
        # mark only the deepest layer; resolved against the actual depth in label_params
        # via the _LAST_LAYER sentinel replacement below.
        return "_bert_layer_candidate"
    if path.startswith("unet_lora/"):
        return "unet_lora"
    return None


def pooler_labeler(path: str) -> str | None:
    """Pooler-MLP conditioning: only the pooler collection trains
    (``Training_sdfusion_bert_pooler.py:136-189``)."""
    if path.startswith("pooler/"):
        return "pooler"
    if path.startswith("unet_lora/"):
        return "unet_lora"
    return None


def clip_ft_labeler(path: str) -> str | None:
    """CLIP fine-tune: last-2 CLIP layers + final LN (``Training_sdfusion_clip.py:64-65,
    118-135``, TRAIN_LAST_N_LAYERS=2)."""
    if path.startswith("clip/layers/"):
        return "_clip_layer_candidate"
    if path.startswith("clip/final_ln/"):
        return "clip_ft"
    return None


def q_only_labeler(path: str) -> str | None:
    """Staged training stage 2 of ``expand_to_Q.py:289,309``: freeze K/V LoRA and adapter,
    train only Q-LoRA leaves."""
    if path.startswith("unet_lora/") and "/to_q/" in path:
        return "unet_lora"
    return None


def aft_froze_adapter_labeler(path: str) -> str | None:
    """``aft_froze_adapter.py:323,332``: adapter frozen, last-BERT-layer output unfrozen,
    LoRA keeps training."""
    if path.startswith("bert/layers/"):
        return "_bert_layer_candidate"
    if path.startswith("unet_lora/"):
        return "unet_lora"
    return None


def embfussion_labeler(path: str) -> str | None:
    """Gated CLIP⊕BERT fusion: fusion gate/adapter + UNet LoRA
    (``Training_sd_bert_embfussion.py:296-307``)."""
    if path.startswith("fusion/"):
        return "fusion"
    if path.startswith("unet_lora/"):
        return "unet_lora"
    return None


def distill_labeler(path: str) -> str | None:
    """Distillation students (``topomap_tpu.train.distill``): fresh LoRA adapters only."""
    if path.startswith("unet_lora/") or path.startswith("ctrl_lora/"):
        return "distill"
    return None


def full_labeler(path: str) -> str | None:
    """Base/trunk pretraining: the WHOLE denoiser stack trains — UNet, ControlNet and the
    text adapter — with only the first stage (VAE, pretrained separately via
    ``pretrain-vae``) and the text towers (BERT/CLIP) frozen. LoRA collections stay frozen
    at raw init (B=0 ⇒ inactive), so the produced base composes with every downstream
    LoRA fine-tune config unchanged.

    This is the repo's equivalent of the reference's pretrained ``Swisstopo.ckpt`` stage:
    every reference training script *loads* a trained base (``addlrSD.py:288-291``) and
    fine-tunes adapters on top; a self-contained from-scratch run must first *create*
    that base — training low-rank adapters on a frozen random trunk cannot denoise
    (round-4 lesson: all adherence evals null, previews structure-free).

    The BERT tower trains too — unlike the reference, whose tower is *pretrained* and
    sensibly frozen, ours starts random, and the measured overfit-gate checkpoint shows
    the trained adapter cannot amplify a frozen random tower's prompt separation (raw
    BERT inter-prompt |Δ| ≈ 32% of scale collapses to ~1% after the adapter; sampled
    eps responds at 0.2%). CLIP stays frozen (unused by the adapter text mode)."""
    if path.startswith("unet/"):
        return "unet"
    if path.startswith("controlnet/"):
        return "controlnet"
    if path.startswith("adapter/"):
        return "adapter"
    if path.startswith("bert/"):
        return "bert"
    return None


LABELERS = {
    "config1": config1_labeler,
    "config2": config2_labeler,
    "config3": config3_labeler,
    "adapter_only": adapter_only_labeler,
    "bert_last_layer": bert_last_layer_labeler,
    "pooler": pooler_labeler,
    "clip_ft": clip_ft_labeler,
    "q_only": q_only_labeler,
    "aft_froze_adapter": aft_froze_adapter_labeler,
    "embfussion": embfussion_labeler,
    "distill": distill_labeler,
    "full": full_labeler,
}

# Per-group base LRs per config (SURVEY.md §2.5-2.6 hyper tables).
GROUP_LRS = {
    "config1": {"ctrl_lora": 3e-5, "adapter": 5e-5},
    "config2": {"ctrl_lora": 7e-5, "ctrl_ft": 1e-4, "adapter": 1e-5},
    "config3": {"ctrl_lora": 2e-5, "ctrl_ft": 2e-5, "unet_lora": 5e-5, "adapter": 5e-5},
    "adapter_only": {"adapter": 5e-5, "unet_lora": 1e-4},
    "bert_last_layer": {"bert_ft": 3e-5, "unet_lora": 2e-4},
    "pooler": {"pooler": 5e-5, "unet_lora": 1e-4},
    "clip_ft": {"clip_ft": 1e-5},
    "q_only": {"unet_lora": 1e-4},
    "aft_froze_adapter": {"bert_ft": 3e-5, "unet_lora": 1e-4},
    "embfussion": {"fusion": 1e-4, "unet_lora": 2e-4},
    "distill": {"distill": 1e-4},
    "full": {"unet": 1e-4, "controlnet": 1e-4, "adapter": 1e-4, "bert": 1e-4},
}


def _resolve_layer_candidates(labels, params: Params, prefix: str, n_last: int, group: str):
    """Turn '_*_layer_candidate' sentinels into real labels for only the last ``n_last``
    transformer layers of collection ``prefix`` (depth read from the actual tree)."""
    coll = params.get(prefix)
    if coll is None or "layers" not in coll:
        return labels
    n_layers = len(coll["layers"])
    keep = {str(i) for i in range(n_layers - n_last, n_layers)}

    flat_l = jax.tree_util.tree_flatten_with_path(labels)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    new = []
    for (path, label), _ in zip(flat_l, flat_p):
        ps = _path_str(path)
        if label == f"_{prefix}_layer_candidate" or (
            label == "_bert_layer_candidate" and prefix == "bert"
        ) or (label == "_clip_layer_candidate" and prefix == "clip"):
            parts = ps.split("/")
            layer_idx = parts[2] if len(parts) > 2 else ""
            # BERT last-layer variant trains only the FFN (mlp + ln2) of the kept layers.
            is_ffn = "/mlp/" in ps or "/ln2/" in ps
            new.append(group if (layer_idx in keep and (prefix == "clip" or is_ffn)) else "frozen")
        else:
            new.append(label)
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(labels), new)


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    config_name: str = "config3"
    total_steps: int = 150_000
    warmup: int = 15_000
    lr_floor: float = 5e-6
    grad_clip: float = 1.0
    weight_decay: float = 0.01
    lr_overrides: dict | None = None  # group -> lr
    # "adamw" (default, reference parity for adapter/LoRA fine-tunes) or "adafactor".
    # Full-trunk pretraining (config "full", 1.22B trainables) MUST use adafactor: fp32
    # Adam moments alone are ~9.8 GB and the v5e's 15.75 GB HBM already holds the fp32
    # bundle (6.2 GB) + grads (4.9 GB). Adafactor's factored second moment (row+col
    # statistics, no first moment) costs ~MBs instead.
    optimizer: str = "adamw"


def label_params(params: Params, labeler: PathPredicate) -> Params:
    """Label tree for optax.multi_transform; frozen params get label 'frozen'.
    Layer-index-dependent regimes ('last N transformer layers') are resolved here against
    the actual tree depth."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    labels = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [labeler(_path_str(p)) or "frozen" for p, _ in flat],
    )
    labels = _resolve_layer_candidates(labels, params, "bert", 1, "bert_ft")
    labels = _resolve_layer_candidates(labels, params, "clip", 2, "clip_ft")
    return labels


def trainable_mask(params: Params, labeler: PathPredicate) -> Params:
    labels = label_params(params, labeler)
    return jax.tree.map(lambda l: l != "frozen", labels)


def count_trainable(params: Params, labeler: PathPredicate) -> int:
    labels = label_params(params, labeler)
    return sum(
        x.size
        for x, l in zip(jax.tree.leaves(params), jax.tree.leaves(labels))
        if l != "frozen"
    )


class ParamPartition:
    """Static split of a parameter tree into trainable leaves (a flat list pytree) and
    frozen leaves (kept in the full tree).

    Why: differentiating and updating the FULL SD1.5 bundle materializes ~5 GB of
    (mostly-zero) gradients plus updates on a 16 GB chip — measured 20 s/step from HBM
    oversubscription. Partitioning makes grads/optimizer-state/updates scale with the
    *trainable* parameter count (~10⁷), the functional analogue of the reference passing
    only selected params to AdamW (``addlrSD.py:345-351``).
    """

    def __init__(self, params: Params, labeler: PathPredicate):
        labels_full = label_params(params, labeler)
        self.treedef = jax.tree_util.tree_structure(params)
        flat_l = jax.tree_util.tree_leaves(labels_full)
        self.idx = tuple(i for i, l in enumerate(flat_l) if l != "frozen")
        self.labels = [flat_l[i] for i in self.idx]
        self.n = len(flat_l)

    def extract(self, params: Params) -> list:
        leaves = jax.tree_util.tree_leaves(params)
        return [leaves[i] for i in self.idx]

    def combine(self, params: Params, train_leaves: list) -> Params:
        leaves = list(jax.tree_util.tree_leaves(params))
        for i, v in zip(self.idx, train_leaves):
            leaves[i] = v
        return jax.tree_util.tree_unflatten(self.treedef, leaves)


def build_optimizer(
    params: Params, cfg: OptimConfig
) -> tuple[optax.GradientTransformation, ParamPartition]:
    """Returns (tx over the TRAINABLE subtree, partition). Grad-clip 1.0 → per-group AdamW
    with its own warmup-cosine-floor schedule. The tx operates on the flat trainable-leaf
    list produced by ``partition.extract`` — frozen params never see the optimizer."""
    labeler = LABELERS[cfg.config_name]
    lrs = dict(GROUP_LRS[cfg.config_name])
    if cfg.lr_overrides:
        lrs.update(cfg.lr_overrides)
    part = ParamPartition(params, labeler)

    def _group_tx(lr):
        schedule = warmup_cosine_floor(lr, cfg.warmup, cfg.total_steps, cfg.lr_floor)
        if cfg.optimizer == "adafactor":
            # multiply_by_parameter_scale=False ⇒ Adam-like absolute-LR semantics (the
            # warmup-cosine schedule applies directly); clipping_threshold bounds the
            # per-tensor update RMS — adafactor's own stabilizer, kept alongside the
            # global-norm grad clip.
            inner = optax.adafactor(
                learning_rate=schedule,
                multiply_by_parameter_scale=False,
                clipping_threshold=1.0,
                weight_decay_rate=None,
            )
        else:
            inner = optax.adamw(schedule, weight_decay=cfg.weight_decay)
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), inner)

    transforms = {group: _group_tx(lr) for group, lr in lrs.items()}
    transforms["frozen"] = optax.set_to_zero()  # defensive; no frozen labels remain
    return optax.multi_transform(transforms, list(part.labels)), part
