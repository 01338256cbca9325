"""Tensor parallelism for the diffusion trunk: Megatron-style weight shardings on a
("data", "model") mesh, expressed as GSPMD PartitionSpecs.

The reference is strictly single-GPU (SURVEY.md §2.9) — data/tile parallelism
(`parallel/mesh.py`) is the primary TPU scaling axis because SD1.5-scale models fit one
chip. Tensor parallelism is the latency axis: when one tile must come back as fast as
possible (interactive stylization, the product's headline loop), the per-eval work itself
is split over the `model` axis — attention heads and FFN hidden units column-sharded,
output projections row-sharded, conv output channels sharded — and XLA's SPMD partitioner
inserts the ICI collectives (all-gather / reduce-scatter) that the sharding algebra
implies. No collective is written by hand; correctness is mesh-shape-independent and is
equality-tested against single-device execution on the CPU mesh
(tests/test_tensor_parallel.py).

Sharding rules (Megatron-LM pattern, arXiv:1909.08053, adapted to the UNet):

  attention to_q/to_k/to_v  (in, heads*dh)  -> P(None, "model")   # column: heads split
  attention to_out          (heads*dh, in)  -> P("model", None)   # row: psum on exit
  FFN proj_in (GEGLU)       (in, 2*hidden)  -> P(None, "model")   # column
  FFN proj_out              (hidden, in)    -> P("model", None)   # row
  conv w                    (kh, kw, ci, co)-> P(..., "model")    # output channels
  resblock time-emb proj    (emb, co)       -> P(None, "model")   # matches conv1 cout
  norms / biases / embeddings / everything outside the UNet+ControlNet trunk -> replicated

Only the diffusion trunk (`unet/`, `controlnet/`) is sharded: the text encoders, VAE and
adapters are a few percent of the FLOPs and stay replicated. Rules are applied by path
regex over ANY pytree whose paths contain the model-tree names, so the same function
shards the raw param tree, a TrainState, or an optax state (mu/nu mirror the param
structure and inherit the same specs — per-device optimizer memory shrinks with tp).
"""
from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "data"
TP_AXIS = "model"

# (path regex, leaf ndim -> PartitionSpec). First match wins; no match -> replicated.
# Paths are "/"-joined key names, list indices normalized away by _norm.
_TP_RULES: tuple[tuple[str, dict[int, P]], ...] = (
    # attention projections (LDM CrossAttention: no bias on q/k/v; to_out has w+b)
    (r"(unet|controlnet)/.*/to_(q|k|v)/w$", {2: P(None, TP_AXIS)}),
    (r"(unet|controlnet)/.*/to_out/w$", {2: P(TP_AXIS, None)}),
    # GEGLU FFN
    (r"(unet|controlnet)/.*/ff/proj_in/w$", {2: P(None, TP_AXIS)}),
    (r"(unet|controlnet)/.*/ff/proj_out/w$", {2: P(TP_AXIS, None)}),
    # spatial-transformer in/out projections (dim -> inner): column then row
    (r"(unet|controlnet)/.*/attn/proj_in/w$", {2: P(None, TP_AXIS)}),
    (r"(unet|controlnet)/.*/attn/proj_out/w$", {2: P(TP_AXIS, None)}),
    # resblock time-embedding projection feeds conv1's output channels
    (r"(unet|controlnet)/.*/res[^/]*/emb/w$", {2: P(None, TP_AXIS)}),
    # convolutions: shard output channels (HWIO). GSPMD all-gathers the input
    # activations per conv; weights and conv FLOPs split 1/tp.
    (r"(unet|controlnet)/.*/w$", {4: P(None, None, None, TP_AXIS)}),
)


def _norm_path(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            continue  # list position carries no name; rules match on key names
        else:
            parts.append(str(k))
    return "/".join(parts)


def tp_spec_for(path_str: str, ndim: int) -> P:
    for pat, by_ndim in _TP_RULES:
        if re.search(pat, path_str) and ndim in by_ndim:
            return by_ndim[ndim]
    return P()


def tp_specs(tree: Any) -> Any:
    """PartitionSpec pytree for `tree` under the Megatron rules above. Works on the param
    tree, a TrainState, or optimizer states — any pytree whose leaf paths contain the
    model key names (optax mu/nu mirror the param structure, so they match too)."""

    def spec(path, leaf):
        return tp_spec_for(_norm_path(path), getattr(leaf, "ndim", 0))

    return jax.tree_util.tree_map_with_path(spec, tree)


def make_mesh_dp_tp(
    n_dp: int, n_tp: int, axis_names: tuple[str, str] = (DP_AXIS, TP_AXIS)
) -> Mesh:
    """2-D (data, model) mesh. On real hardware the `model` axis should be the
    inner/fastest ICI dimension (tensor-parallel collectives fire per layer; gradient
    all-reduce over `data` fires once per step)."""
    devices = jax.devices()
    if n_dp * n_tp > len(devices):
        raise ValueError(f"need {n_dp * n_tp} devices, have {len(devices)}")
    grid = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(grid, axis_names)


def tp_shardings(mesh: Mesh, tree: Any) -> Any:
    """NamedSharding pytree for `tree` on `mesh` under the TP rules. A rule is dropped
    (replicated) for any leaf whose sharded dimension does not divide the model-axis
    size — e.g. the 4-channel hint-block conv_in on an 8-way model axis."""
    tp_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(TP_AXIS, 1)

    def sharding(path, leaf):
        spec = tp_spec_for(_norm_path(path), getattr(leaf, "ndim", 0))
        shape = getattr(leaf, "shape", ())
        for dim, axis in enumerate(spec):
            if axis == TP_AXIS and shape[dim] % tp_size != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(sharding, tree)


def shard_params_tp(mesh: Mesh, tree: Any) -> Any:
    """device_put `tree` with trunk weights sharded over the model axis, rest replicated."""
    sh = tp_shardings(mesh, tree)
    return jax.tree.map(jax.device_put, tree, sh)


def batch_sharding_dp(mesh: Mesh) -> NamedSharding:
    """Data tensors shard their leading (batch/tile) axis over `data` only — every member
    of a model-axis group sees the same examples."""
    return NamedSharding(mesh, P(DP_AXIS))
