"""ControlLoRA — lightweight control-conditioned attention, both reference flavors.

The reference carries two ControlNet-free conditioning mechanisms (SURVEY.md §2.4):

* **LDM-native** (``LoRA_modified/attention_lora.py:35-137``): every CrossAttention gets
  q/k/v/out LoRA plus a zero-init rank-bottleneck ``to_control``; a mini 3-conv encoder
  (``ControlLoRA``, ``:87-101``) produces a control feature map whose ``to_control``
  projection is ADDED TO THE ATTENTION OUTPUT when shapes match (``:74-81``).
* **diffusers-style** (``LoRA_modified/models.py:72-431,618-833``, adapted from
  HighCWu/ControlLoRA): a conv encoder with per-stage ``pre_lora_layers`` projecting stage
  features to the UNet widths; attention processors where the control state (optionally
  ``concat_hidden``, optionally ``self_add``) passes through a ``to_control`` LoRA and is
  added to the Q-LoRA *input* (``:203-241``); V2 injects into hidden states pre-QKV and
  pre-out via ``to_control``/``to_control_out`` (``:292-431``); k/v/out LoRAs carry skip
  flags and a ``post_add`` mode.

Functional redesign: the encoder is an (init, apply) pair; the per-attention control
machinery lives as extra leaves in the standard LoRA mirror tree (``"control"`` sub-dict),
and ``inject_control_states`` writes the runtime control states into the tree (like
``attach_condition``) keyed by each attention block's downsampling factor — so the same
``unet_apply`` runs unchanged and everything jits.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from topomap_tpu.models.nn import KeyGen, Params, conv, conv_init, rand_normal, silu
from topomap_tpu.models.unet import UNetConfig, _level_channels
from topomap_tpu.lora.lora import LoRASpec, _kaiming_a5, build_lora_tree


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ControlLoRAEncoderConfig:
    in_channels: int = 3
    stage_channels: tuple[int, ...] = (32, 64, 128, 256)  # models.py:618-833 down stages
    rank: int = 4
    control_rank: Optional[int] = None
    concat_hidden: bool = False
    self_add: bool = True
    v2: bool = False


def control_encoder_init(key, cfg: ControlLoRAEncoderConfig, unet_cfg: UNetConfig) -> Params:
    """conv_in + one stride-2 conv block per stage + per-stage ``pre_lora`` projection to
    the UNet width at that resolution (320/640/1280/1280 for SD1.5)."""
    kg = KeyGen(key)
    widths = [unet_cfg.model_channels * m for m in unet_cfg.channel_mult]
    stages = []
    c = cfg.stage_channels[0]
    p: Params = {"conv_in": conv_init(kg(), cfg.in_channels, c, 3)}
    for si, ch in enumerate(cfg.stage_channels):
        stage = {
            "conv": conv_init(kg(), c, ch, 3),
            "pre_lora": {
                "w": rand_normal(kg(), (ch, widths[min(si, len(widths) - 1)]), 0.02)
            },
        }
        c = ch
        stages.append(stage)
    p["stages"] = stages
    return p


def control_encoder_apply(p: Params, cfg: ControlLoRAEncoderConfig, hint: jnp.ndarray) -> list[jnp.ndarray]:
    """hint [B,H,W,3] → per-stage control states [B, H/2^(i+1)·W/2^(i+1), width_i].

    Stage i downsamples by 2 each time, landing on the UNet's encoder resolutions when the
    hint enters at latent resolution ×2 (or full-res with the first strides absorbing /8 —
    the caller picks the hint scale)."""
    h = silu(conv(p["conv_in"], hint))
    states = []
    for stage in p["stages"]:
        h = silu(conv(stage["conv"], h, stride=2))
        b, hh, ww, c = h.shape
        flat = h.reshape(b, hh * ww, c)
        states.append(jnp.dot(flat, stage["pre_lora"]["w"].astype(flat.dtype)))
    return states


def mini_control_encoder_init(key, in_channels: int = 3, base_channels: int = 64) -> Params:
    """LDM-native mini encoder (``attention_lora.py:87-101``): 3 convs, strides 1/2/2."""
    kg = KeyGen(key)
    return {
        "c1": conv_init(kg(), in_channels, base_channels, 3),
        "c2": conv_init(kg(), base_channels, base_channels * 2, 3),
        "c3": conv_init(kg(), base_channels * 2, base_channels * 4, 3),
    }


def mini_control_encoder_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = silu(conv(p["c1"], x))
    h = silu(conv(p["c2"], h, stride=2))
    return silu(conv(p["c3"], h, stride=2))


# ---------------------------------------------------------------------------
# Control-aware LoRA tree
# ---------------------------------------------------------------------------


def _control_leaf(key, ctrl_ch: int, hidden: int, rank: int, concat_hidden: bool, self_add: bool, v2: bool) -> Params:
    d_in = ctrl_ch + (hidden if concat_hidden else 0)
    leaf: Params = {
        "A": _kaiming_a5(key, d_in, rank),
        "B": jnp.zeros((rank, hidden), jnp.float32),
        "scale": jnp.asarray(1.0, jnp.float32),
    }
    if concat_hidden:
        leaf["concat_hidden"] = jnp.asarray(1, jnp.int32)  # presence = flag (static)
    if self_add and ctrl_ch == hidden and not concat_hidden:
        leaf["self_add"] = jnp.asarray(1, jnp.int32)
    if v2:
        leaf["v2"] = jnp.asarray(1, jnp.int32)
    return leaf


def build_control_lora_tree(
    unet_params: Params,
    unet_cfg: UNetConfig,
    cfg: ControlLoRAEncoderConfig,
    key,
    spec: Optional[LoRASpec] = None,
) -> Params:
    """Standard q/k/v/out LoRA mirror tree + a ``control`` sub-dict (``to_control`` [+ v2
    ``to_control_out``]) on every attn1 (self-attention sees the spatial control)."""
    spec = spec or LoRASpec.qkvo(cfg.rank)
    tree = build_lora_tree(unet_params, spec, key)

    counter = [0]

    def next_key():
        counter[0] += 1
        return jax.random.fold_in(key, 10_000 + counter[0])

    def walk(lora_node, params_node, ds_map_path):
        if not isinstance(lora_node, dict):
            return
        for k, v in lora_node.items():
            if k == "attn1" and isinstance(v, dict):
                hidden = _attn_hidden(params_node["attn1"]) if "attn1" in params_node else None
                if hidden is None:
                    continue
                rank = cfg.control_rank or cfg.rank
                ctrl_ch = hidden  # pre_lora projected control matches the UNet width
                v["control"] = {
                    "to_control": _control_leaf(
                        next_key(), ctrl_ch, hidden, rank, cfg.concat_hidden, cfg.self_add, cfg.v2
                    )
                }
                if cfg.v2:
                    v["control"]["to_control_out"] = _control_leaf(
                        next_key(), ctrl_ch, hidden, rank, False, False, False
                    )
            else:
                pk = params_node.get(k) if isinstance(params_node, dict) else (
                    params_node[k] if isinstance(params_node, (list, tuple)) and isinstance(k, int) and k < len(params_node) else None
                )
                if pk is not None:
                    walk(v, pk, ds_map_path)

    walk(tree, unet_params, "")
    return tree


def _attn_hidden(attn_params) -> Optional[int]:
    try:
        return attn_params["to_q"]["w"].shape[1]
    except Exception:
        return None


def _ds_to_width(cfg: UNetConfig) -> dict[int, int]:
    out = {}
    ds = 1
    for li, mult in enumerate(cfg.channel_mult):
        out[ds] = cfg.model_channels * mult
        if li != len(cfg.channel_mult) - 1:
            ds *= 2
    return out


def encoder_block_ds(cfg: UNetConfig) -> list[int]:
    """Downsampling factor of each encoder block (index-aligned with encoder.blocks)."""
    out = [1]
    ds = 1
    for kind, _ci, _co, _attn in _level_channels(cfg):
        if kind == "down":
            ds *= 2
        out.append(ds)
    return out


def decoder_block_ds(cfg: UNetConfig) -> list[int]:
    out = []
    ds = 2 ** (len(cfg.channel_mult) - 1)
    for li in reversed(range(len(cfg.channel_mult))):
        for bi in range(cfg.num_res_blocks + 1):
            out.append(ds)
            if li != 0 and bi == cfg.num_res_blocks:
                ds //= 2
    return out


def inject_control_states(
    lora_tree: Params, unet_cfg: UNetConfig, states: list[jnp.ndarray]
) -> Params:
    """Write per-resolution control states (from ``control_encoder_apply``, ordered by
    stage) into every attention's ``control`` sub-dict — the functional analogue of
    ``ControlLoRA.forward`` pushing states into processors (``models.py:823-833``).

    Matching rule: attention at downsampling factor ``ds = 2^i`` receives ``states[i]``
    when its sequence length equals the state's (i.e. stages align with UNet levels).
    """
    ds_widths = sorted(_ds_to_width(unet_cfg))
    ds_to_state = {ds: states[i] for i, ds in enumerate(ds_widths) if i < len(states)}

    enc_ds = encoder_block_ds(unet_cfg)
    dec_ds = decoder_block_ds(unet_cfg)

    def assign(section: str, node):
        if not isinstance(node, dict) or node is None:
            return node
        blocks = node.get("blocks")
        if blocks is None:
            return node
        ds_list = enc_ds if section == "encoder" else dec_ds
        new_blocks = {}
        for bi, bnode in blocks.items():
            ds = ds_list[bi] if bi < len(ds_list) else None
            new_blocks[bi] = _assign_block(bnode, ds_to_state.get(ds))
        return dict(node, blocks=new_blocks)

    def _assign_block(bnode, state):
        if state is None or not isinstance(bnode, dict):
            return bnode
        out = dict(bnode)
        attn = out.get("attn")
        if isinstance(attn, dict):
            out["attn"] = _assign_transformer(attn, state)
        return out

    def _assign_transformer(attn_node, state):
        out = dict(attn_node)
        blocks = out.get("blocks")
        if isinstance(blocks, dict):
            nb = {}
            for i, tb in blocks.items():
                tb = dict(tb)
                if "attn1" in tb and isinstance(tb["attn1"], dict) and "control" in tb["attn1"]:
                    a1 = dict(tb["attn1"])
                    a1["control"] = dict(a1["control"], state=state)
                    tb["attn1"] = a1
                nb[i] = tb
            out["blocks"] = nb
        return out

    tree = dict(lora_tree)
    mid_ds = 2 ** (len(unet_cfg.channel_mult) - 1)
    for section in ("encoder", "decoder"):
        if section in tree and tree[section]:
            tree[section] = assign(section, tree[section])
    if "middle" in tree and tree["middle"] and mid_ds in ds_to_state:
        mid = dict(tree["middle"])
        if "attn" in mid:
            mid["attn"] = _assign_transformer(mid["attn"], ds_to_state[mid_ds])
        tree["middle"] = mid
    return tree


def build_ldm_control_lora_tree(
    unet_params: Params, key, rank: int = 4, control_rank: Optional[int] = None
) -> Params:
    """LDM-native flavor (``attention_lora.py:107-137``): q/k/v/out LoRA on EVERY
    CrossAttention + zero-init ``to_control`` whose projection of the (flattened) mini-
    encoder feature is added to the attention OUTPUT (``add_to_output`` marker,
    ``:74-81``). Control state channel count must equal the attention hidden size to take
    effect — exactly the reference's shape-match guard."""
    tree = build_lora_tree(unet_params, LoRASpec.qkvo(rank), key)
    counter = [0]

    def next_key():
        counter[0] += 1
        return jax.random.fold_in(key, 20_000 + counter[0])

    def walk(lora_node, params_node):
        if not isinstance(lora_node, dict):
            return
        for k, v in lora_node.items():
            if k in ("attn1", "attn2") and isinstance(v, dict):
                hidden = _attn_hidden(params_node.get(k, {})) if isinstance(params_node, dict) else None
                if hidden is None:
                    continue
                leaf = _control_leaf(next_key(), hidden, hidden, control_rank or rank, False, False, False)
                leaf["add_to_output"] = jnp.asarray(1, jnp.int32)
                v["control"] = {"to_control": leaf}
            else:
                pk = None
                if isinstance(params_node, dict):
                    pk = params_node.get(k)
                elif isinstance(params_node, (list, tuple)) and isinstance(k, int) and k < len(params_node):
                    pk = params_node[k]
                if pk is not None:
                    walk(v, pk)

    walk(tree, unet_params)
    return tree


def control_delta(control: Params, x: jnp.ndarray) -> jnp.ndarray:
    """``process_control_states`` (``models.py:201-220``): control through the
    ``to_control`` LoRA (optionally concat with hidden; optionally self-added). Returns a
    [B,T,hidden] tensor to add to the Q-LoRA input (or to hidden pre-QKV in v2 mode)."""
    leaf = control["to_control"]
    state = control["state"].astype(x.dtype)
    if state.ndim == 4:
        b, hh, ww, c = state.shape
        state = state.reshape(b, hh * ww, c)
    if state.shape[0] != x.shape[0]:  # CFG 2B batch
        reps = -(-x.shape[0] // state.shape[0])
        state = jnp.tile(state, (reps, 1, 1))[: x.shape[0]]
    inp = jnp.concatenate([x, state], axis=-1) if "concat_hidden" in leaf else state
    delta = jnp.dot(jnp.dot(inp, leaf["A"].astype(x.dtype)), leaf["B"].astype(x.dtype))
    delta = leaf["scale"].astype(x.dtype) * delta
    if "self_add" in leaf:
        delta = state + delta
    return delta
