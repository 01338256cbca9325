"""Structural sanity tools — the reference's ad-hoc audits as library functions.

* ``audit_checkpoint`` — top-level key-prefix report of an LDM state dict + ControlNet
  presence check (``BaseModel/CheckBaseModel.py:4-13``).
* ``summarize_params`` — module-structure/param-count dump of any param tree
  (the ``bert_test.py:16-33`` UNet-block dump, generalized).
* ``assert_frozen`` — verify a collection stayed bit-identical across a training run
  (``Training_sdfusion_bert.assert_frozen_controlnet:228-235``).
"""
from __future__ import annotations

from collections import Counter
from typing import Any

import jax
import numpy as np


def audit_checkpoint(sd: dict) -> dict:
    """Key-prefix histogram + ControlNet detection for a flat state dict."""
    prefixes = Counter(k.split(".")[0] for k in sd)
    return {
        "num_keys": len(sd),
        "prefixes": dict(prefixes),
        "has_controlnet": any(k.startswith("control_model") for k in sd),
        "total_params": int(sum(np.asarray(v).size for v in sd.values())),
    }


def summarize_params(tree: Any, max_depth: int = 3) -> str:
    """Human-readable tree summary: per-subtree param counts down to ``max_depth``."""
    lines: list[str] = []

    def count(node) -> int:
        return sum(x.size for x in jax.tree.leaves(node))

    def walk(node, name, depth):
        if depth > max_depth or not isinstance(node, (dict, list, tuple)):
            return
        lines.append(f"{'  ' * depth}{name}: {count(node):,} params")
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, str(k), depth + 1)
        elif depth + 1 <= max_depth and len(node) <= 4:
            for i, v in enumerate(node):
                walk(v, f"[{i}]", depth + 1)
        elif isinstance(node, (list, tuple)):
            lines.append(f"{'  ' * (depth + 1)}[{len(node)} entries]")

    walk(tree, "root", 0)
    return "\n".join(lines)


def assert_frozen(before: Any, after: Any, name: str = "collection") -> None:
    """Raise if any leaf changed — the frozen-collection assertion."""
    for (pa, a), (_pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(before)[0],
        jax.tree_util.tree_flatten_with_path(after)[0],
    ):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            raise AssertionError(f"{name}{jax.tree_util.keystr(pa)} changed but should be frozen")


def count_params(tree: Any) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))
