"""PyTorch-checkpoint ⇄ JAX parameter-tree conversion (LDM / ControlNet / HF key spaces).

The entire reference project sits on ``Swisstopo.ckpt`` — an LDM-format SD1.5+ControlNet
state dict loaded ``strict=False`` and then overlaid with filtered LoRA/adapter checkpoints
(``addlrSD.py:288-296``, ``quantitative_metrics.py:44-55``). This module provides the exact
key-space mapping both ways:

* ``import_ldm_unet`` / ``export_ldm_unet`` — ``model.diffusion_model.*``
* ``import_ldm_controlnet`` / ``export_ldm_controlnet`` — ``control_model.*``
* ``import_ldm_vae`` / ``export_ldm_vae`` — ``first_stage_model.*``
* ``load_sd_checkpoint`` — whole-ckpt dispatch with the reference's ``strict=False``
  overlay semantics (missing keys keep their current values, unexpected keys are returned).

Weight-layout conventions converted: torch Linear stores ``[out, in]`` (ours ``[in, out]``),
torch Conv2d ``OIHW`` (ours ``HWIO``); LDM's SpatialTransformer ``proj_in``/``proj_out`` are
1×1 convs (ours dense). All pure numpy — no torch import needed to convert a loaded dict
(``torch.load`` happens in :func:`read_torch_file` only).
"""
from __future__ import annotations

from typing import Any, Callable

import numpy as np

from topomap_tpu.models.unet import UNetConfig, _level_channels

Params = dict[str, Any]
StateDict = dict[str, np.ndarray]


# ---------------------------------------------------------------------------
# Leaf converters
# ---------------------------------------------------------------------------


def _lin_in(w):  # torch [out,in] -> ours [in,out]
    return np.ascontiguousarray(np.asarray(w).T)


def _lin_out(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _conv_in(w):  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _conv_out(w):  # HWIO -> OIHW
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


def _conv1x1_to_dense(w):  # [out,in,1,1] -> [in,out]
    return np.ascontiguousarray(np.asarray(w)[:, :, 0, 0].T)


def _dense_to_conv1x1(w):  # [in,out] -> [out,in,1,1]
    return np.ascontiguousarray(np.asarray(w).T[:, :, None, None])


# ---------------------------------------------------------------------------
# Key-map builders: list of (ldm_key, our_path, import_fn, export_fn)
# our_path is a tuple of keys/ints into the param tree.
# ---------------------------------------------------------------------------

_ID = lambda x: np.asarray(x)


def _norm_entries(ldm_prefix, path):
    return [
        (f"{ldm_prefix}.weight", path + ("scale",), _ID, _ID),
        (f"{ldm_prefix}.bias", path + ("bias",), _ID, _ID),
    ]


def _dense_entries(ldm_prefix, path):
    return [
        (f"{ldm_prefix}.weight", path + ("w",), _lin_in, _lin_out),
        (f"{ldm_prefix}.bias", path + ("b",), _ID, _ID),
    ]


def _conv_entries(ldm_prefix, path):
    return [
        (f"{ldm_prefix}.weight", path + ("w",), _conv_in, _conv_out),
        (f"{ldm_prefix}.bias", path + ("b",), _ID, _ID),
    ]


def _conv1x1_as_dense_entries(ldm_prefix, path):
    return [
        (f"{ldm_prefix}.weight", path + ("w",), _conv1x1_to_dense, _dense_to_conv1x1),
        (f"{ldm_prefix}.bias", path + ("b",), _ID, _ID),
    ]


def _resblock_entries(pfx, path):
    e = []
    e += _norm_entries(f"{pfx}.in_layers.0", path + ("in_norm",))
    e += _conv_entries(f"{pfx}.in_layers.2", path + ("in_conv",))
    e += _dense_entries(f"{pfx}.emb_layers.1", path + ("emb",))
    e += _norm_entries(f"{pfx}.out_layers.0", path + ("out_norm",))
    e += _conv_entries(f"{pfx}.out_layers.3", path + ("out_conv",))
    # skip_connection present iff channel change (1×1 conv in LDM); handled lazily at
    # import (ignored if our tree has no "skip").
    e += _conv_entries(f"{pfx}.skip_connection", path + ("skip",))
    return e


def _attn_entries(pfx, path):
    e = []
    for name in ("to_q", "to_k", "to_v"):
        e.append((f"{pfx}.{name}.weight", path + (name, "w"), _lin_in, _lin_out))
    e += _dense_entries(f"{pfx}.to_out.0", path + ("to_out",))
    return e


def _transformer_entries(pfx, path, depth: int):
    e = []
    e += _norm_entries(f"{pfx}.norm", path + ("norm",))
    e += _conv1x1_as_dense_entries(f"{pfx}.proj_in", path + ("proj_in",))
    for d in range(depth):
        bp = f"{pfx}.transformer_blocks.{d}"
        bpath = path + ("blocks", d)
        e += _norm_entries(f"{bp}.norm1", bpath + ("norm1",))
        e += _attn_entries(f"{bp}.attn1", bpath + ("attn1",))
        e += _norm_entries(f"{bp}.norm2", bpath + ("norm2",))
        e += _attn_entries(f"{bp}.attn2", bpath + ("attn2",))
        e += _norm_entries(f"{bp}.norm3", bpath + ("norm3",))
        e += _dense_entries(f"{bp}.ff.net.0.proj", bpath + ("ff", "proj_in"))
        e += _dense_entries(f"{bp}.ff.net.2", bpath + ("ff", "proj_out"))
    e += _conv1x1_as_dense_entries(f"{pfx}.proj_out", path + ("proj_out",))
    return e


def _middle_entries(pfx, path, cfg: UNetConfig):
    e = []
    e += _resblock_entries(f"{pfx}.0", path + ("res1",))
    e += _transformer_entries(f"{pfx}.1", path + ("attn",), cfg.transformer_depth)
    e += _resblock_entries(f"{pfx}.2", path + ("res2",))
    return e


def _encoder_entries(prefix: str, cfg: UNetConfig):
    """input_blocks.* — LDM index i ↔ our encoder.blocks[i]."""
    e = _conv_entries(f"{prefix}.input_blocks.0.0", ("encoder", "blocks", 0, "conv_in"))
    for i, (kind, _ci, _co, attn) in enumerate(_level_channels(cfg), start=1):
        pfx = f"{prefix}.input_blocks.{i}"
        path = ("encoder", "blocks", i)
        if kind == "down":
            e += _conv_entries(f"{pfx}.0.op", path + ("down",))
        else:
            e += _resblock_entries(f"{pfx}.0", path + ("res",))
            if attn:
                e += _transformer_entries(f"{pfx}.1", path + ("attn",), cfg.transformer_depth)
    return e


def _decoder_entries(prefix: str, cfg: UNetConfig):
    e = []
    i = 0
    ds = 2 ** (len(cfg.channel_mult) - 1)
    for li in reversed(range(len(cfg.channel_mult))):
        for bi in range(cfg.num_res_blocks + 1):
            pfx = f"{prefix}.output_blocks.{i}"
            path = ("decoder", "blocks", i)
            e += _resblock_entries(f"{pfx}.0", path + ("res",))
            sub = 1
            if ds in cfg.attention_ds:
                e += _transformer_entries(f"{pfx}.{sub}", path + ("attn",), cfg.transformer_depth)
                sub += 1
            if li != 0 and bi == cfg.num_res_blocks:
                e += _conv_entries(f"{pfx}.{sub}.conv", path + ("up",))
                ds //= 2
            i += 1
    return e


def unet_keymap(cfg: UNetConfig, prefix: str = "model.diffusion_model"):
    e = []
    e += _dense_entries(f"{prefix}.time_embed.0", ("time_embed", "fc1"))
    e += _dense_entries(f"{prefix}.time_embed.2", ("time_embed", "fc2"))
    e += _encoder_entries(prefix, cfg)
    e += _middle_entries(f"{prefix}.middle_block", ("middle",), cfg)
    e += _decoder_entries(prefix, cfg)
    e += _norm_entries(f"{prefix}.out.0", ("out_norm",))
    e += _conv_entries(f"{prefix}.out.2", ("out_conv",))
    return e


def controlnet_keymap(cfg: UNetConfig, prefix: str = "control_model"):
    e = []
    e += _dense_entries(f"{prefix}.time_embed.0", ("time_embed", "fc1"))
    e += _dense_entries(f"{prefix}.time_embed.2", ("time_embed", "fc2"))
    # hint block: 8 convs at LDM sequence indices 0,2,4,6,8,10,12,14
    for ci in range(8):
        e += _conv_entries(
            f"{prefix}.input_hint_block.{2*ci}", ("input_hint_block", "convs", ci)
        )
    e += _encoder_entries(prefix, cfg)
    e += _middle_entries(f"{prefix}.middle_block", ("middle",), cfg)
    n_zero = 1 + len(_level_channels(cfg))
    for zi in range(n_zero):
        e += _conv_entries(f"{prefix}.zero_convs.{zi}.0", ("zero_convs", zi))
    e += _conv_entries(f"{prefix}.middle_block_out.0", ("middle_block_out",))
    return e


# ---------------------------------------------------------------------------
# VAE keymap
# ---------------------------------------------------------------------------


def _vae_res_entries(pfx, path):
    e = []
    e += _norm_entries(f"{pfx}.norm1", path + ("norm1",))
    e += _conv_entries(f"{pfx}.conv1", path + ("conv1",))
    e += _norm_entries(f"{pfx}.norm2", path + ("norm2",))
    e += _conv_entries(f"{pfx}.conv2", path + ("conv2",))
    e += _conv_entries(f"{pfx}.nin_shortcut", path + ("skip",))
    return e


def _vae_attn_entries(pfx, path):
    e = _norm_entries(f"{pfx}.norm", path + ("norm",))
    for ldm_n, our_n in (("q", "q"), ("k", "k"), ("v", "v"), ("proj_out", "out")):
        e += _conv_entries(f"{pfx}.{ldm_n}", path + (our_n,))
    return e


def vae_keymap(cfg, prefix: str = "first_stage_model"):
    from topomap_tpu.models.vae import VAEConfig  # noqa: F401 (doc)

    e = []
    # encoder
    e += _conv_entries(f"{prefix}.encoder.conv_in", ("encoder", "conv_in"))
    for li in range(len(cfg.channel_mult)):
        for bi in range(cfg.num_res_blocks):
            e += _vae_res_entries(
                f"{prefix}.encoder.down.{li}.block.{bi}", ("encoder", "down", li, "res", bi)
            )
        if li != len(cfg.channel_mult) - 1:
            e += _conv_entries(
                f"{prefix}.encoder.down.{li}.downsample.conv", ("encoder", "down", li, "down")
            )
    e += _vae_res_entries(f"{prefix}.encoder.mid.block_1", ("encoder", "mid", "res1"))
    e += _vae_attn_entries(f"{prefix}.encoder.mid.attn_1", ("encoder", "mid", "attn"))
    e += _vae_res_entries(f"{prefix}.encoder.mid.block_2", ("encoder", "mid", "res2"))
    e += _norm_entries(f"{prefix}.encoder.norm_out", ("encoder", "norm_out"))
    e += _conv_entries(f"{prefix}.encoder.conv_out", ("encoder", "conv_out"))
    e += _conv_entries(f"{prefix}.quant_conv", ("quant_conv",))
    # decoder — LDM decoder "up" list is indexed in REVERSE (up.0 is the last level)
    e += _conv_entries(f"{prefix}.post_quant_conv", ("post_quant_conv",))
    e += _conv_entries(f"{prefix}.decoder.conv_in", ("decoder", "conv_in"))
    e += _vae_res_entries(f"{prefix}.decoder.mid.block_1", ("decoder", "mid", "res1"))
    e += _vae_attn_entries(f"{prefix}.decoder.mid.attn_1", ("decoder", "mid", "attn"))
    e += _vae_res_entries(f"{prefix}.decoder.mid.block_2", ("decoder", "mid", "res2"))
    n_levels = len(cfg.channel_mult)
    for our_i in range(n_levels):  # our decoder.up[0] = highest mult = LDM up.{n-1}
        ldm_i = n_levels - 1 - our_i
        for bi in range(cfg.num_res_blocks + 1):
            e += _vae_res_entries(
                f"{prefix}.decoder.up.{ldm_i}.block.{bi}", ("decoder", "up", our_i, "res", bi)
            )
        if our_i != n_levels - 1:
            e += _conv_entries(
                f"{prefix}.decoder.up.{ldm_i}.upsample.conv", ("decoder", "up", our_i, "up")
            )
    e += _norm_entries(f"{prefix}.decoder.norm_out", ("decoder", "norm_out"))
    e += _conv_entries(f"{prefix}.decoder.conv_out", ("decoder", "conv_out"))
    return e


# ---------------------------------------------------------------------------
# Tree get/set + import/export drivers
# ---------------------------------------------------------------------------


def _tree_get(tree, path):
    node = tree
    for p in path:
        if isinstance(node, dict):
            if p not in node:
                return None
            node = node[p]
        else:
            if not isinstance(p, int) or p >= len(node):
                return None
            node = node[p]
    return node


def _tree_set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def import_keymap(
    params: Params, sd: StateDict, keymap, strict: bool = False
) -> tuple[Params, list[str], list[str]]:
    """Overlay ``sd`` onto a (deep-copied) param tree via the keymap.

    Returns (new_params, missing_keys, loaded_keys). ``strict=False`` reproduces the
    reference's load semantics: keys absent from ``sd`` keep current values.
    """
    import copy
    import jax.numpy as jnp

    out = copy.deepcopy(params)
    missing, loaded = [], []
    for ldm_key, path, imp, _exp in keymap:
        if ldm_key not in sd:
            if _tree_get(out, path) is not None:
                missing.append(ldm_key)
            continue
        cur = _tree_get(out, path)
        if cur is None:
            continue  # e.g. skip_connection on identity resblocks
        val = imp(sd[ldm_key]).astype(np.float32)
        if tuple(val.shape) != tuple(cur.shape):
            raise ValueError(f"shape mismatch {ldm_key}: ckpt {val.shape} vs tree {cur.shape}")
        _tree_set(out, path, jnp.asarray(val))
        loaded.append(ldm_key)
    if strict and missing:
        raise KeyError(f"missing {len(missing)} keys, first: {missing[:5]}")
    return out, missing, loaded


def export_keymap(params: Params, keymap) -> StateDict:
    sd: StateDict = {}
    for ldm_key, path, _imp, exp in keymap:
        cur = _tree_get(params, path)
        if cur is None:
            continue
        sd[ldm_key] = exp(np.asarray(cur))
    return sd


def read_torch_file(path: str) -> StateDict:
    """Load a ``.ckpt``/``.pt``/``.safetensors`` file to a numpy state dict."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v) for k, v in sd.items()}


def attach_control_from_unet(sd: StateDict, cfg) -> tuple[StateDict, int]:
    """``tool_add_control.py`` equivalent: synthesize ``control_model.*`` keys from
    ``model.diffusion_model.*`` for a plain-SD checkpoint.

    The reference's documented base-pipeline attach step (``BaseModel/README.docx``)
    clones a ControlNet onto SD1.5 by copying every UNet weight whose name/shape matches
    into the control encoder/middle, leaving the ControlNet-only parts (input hint block,
    zero convs, middle-block-out) at their fresh init — zero convs stay zero, preserving
    the LDM zero_module contract that the attached model initially reproduces the base.
    Returns ``(augmented state dict, number of synthesized keys)``.
    """
    out = dict(sd)
    n = 0
    for ldm_key, *_ in controlnet_keymap(cfg.unet):
        src = "model.diffusion_model." + ldm_key[len("control_model."):]
        if ldm_key not in out and src in sd:
            out[ldm_key] = sd[src]
            n += 1
    return out, n


def load_sd_checkpoint(params: Params, cfg, sd: StateDict) -> tuple[Params, dict]:
    """Full-checkpoint load with ``strict=False`` overlay (``addlrSD.py:288-291``):
    UNet + VAE + ControlNet collections from one LDM-format dict. Returns (params, report).

    If the dict has no ``control_model.*`` keys (a plain SD1.5 checkpoint, pre
    ``tool_add_control``), the ControlNet encoder/middle is initialized from the UNet
    weights via :func:`attach_control_from_unet` — the reference's attach step."""
    report = {}
    params = dict(params)
    if not any(k.startswith("control_model.") for k in sd):
        sd, n_attached = attach_control_from_unet(sd, cfg)
        report["controlnet_attached_from_unet"] = n_attached
    params["unet"], m1, l1 = import_keymap(params["unet"], sd, unet_keymap(cfg.unet))
    params["vae"], m2, l2 = import_keymap(params["vae"], sd, vae_keymap(cfg.vae))
    params["controlnet"], m3, l3 = import_keymap(
        params["controlnet"], sd, controlnet_keymap(cfg.unet)
    )
    report["missing"] = m1 + m2 + m3
    report["loaded"] = len(l1) + len(l2) + len(l3)
    known = {k for k, *_ in unet_keymap(cfg.unet)} | {k for k, *_ in vae_keymap(cfg.vae)} | {
        k for k, *_ in controlnet_keymap(cfg.unet)
    }
    report["unexpected"] = [k for k in sd if k not in known]
    return params, report
