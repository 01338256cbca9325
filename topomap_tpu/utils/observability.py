"""Observability: profiler hooks, step timing, throughput counters, NaN/Inf guards,
deterministic-run mode — the aux subsystems the reference lacks (SURVEY.md §5: only
``time.time()`` bracketing at ``BaseModel/evaluateCN.py:17-18,130-131``).
"""
from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(log_dir: str | Path | None):
    """``jax.profiler`` trace scope (view in TensorBoard/XProf). No-op when log_dir None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-time + items/sec meter with warmup skip (compile steps excluded)."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup = warmup_steps
        self.count = 0
        self.total = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt
        return False

    @property
    def steps_per_sec(self) -> float:
        measured = self.count - self.warmup
        return measured / self.total if measured > 0 and self.total > 0 else 0.0

    def items_per_sec(self, items_per_step: int) -> float:
        return self.steps_per_sec * items_per_step


class ThroughputLog:
    """Append-only JSONL of {step, wall_time, steps_per_sec, tiles_per_sec} records —
    the tiles/sec/chip counter backing bench.py's metric."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def write(self, step: int, timer: StepTimer, items_per_step: int,
              steps_per_dispatch: int = 1, extra: dict | None = None) -> None:
        # timer counts dispatches; with lax.scan chunks one dispatch covers
        # steps_per_dispatch optimizer steps — record optimizer-steps/s, not chunks/s.
        # "v": 2 marks records with these (post-fix) semantics; v1 rows logged the raw
        # dispatch rate in steps_per_sec.
        rec = {
            "v": 2,
            "step": step,
            "time": time.time(),
            "steps_per_sec": timer.steps_per_sec * steps_per_dispatch,
            "tiles_per_sec": timer.items_per_sec(items_per_step),
        }
        if extra:
            rec.update(extra)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def check_finite(tree: Any, name: str = "tree") -> None:
    """Host-side NaN/Inf guard over a pytree (call at checkpoints / on val cadence).
    Raises FloatingPointError naming the first offending path."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                raise FloatingPointError(f"non-finite values in {name}{jax.tree_util.keystr(path)}")


def finite_or_skip_update(updates: Any, params: Any) -> Any:
    """In-graph guard: zero the whole update when ANY leaf is non-finite — keeps long
    unattended runs alive through a bad batch instead of poisoning the weights."""
    leaves = [jnp.isfinite(u).all() for u in jax.tree.leaves(updates) if hasattr(u, "dtype")]
    ok = jnp.stack(leaves).all() if leaves else jnp.asarray(True)
    return jax.tree.map(lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates)


def enable_deterministic_mode() -> None:
    """Best-effort bitwise determinism: disable autotuning-dependent reductions."""
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_gpu_deterministic_ops=true"
    ).strip()
    jax.config.update("jax_default_matmul_precision", "highest")


def log_compile_cache_stats() -> dict:
    """Compilation-cache introspection for startup-latency debugging."""
    from jax._src import compilation_cache

    try:
        return {"cache_enabled": compilation_cache.is_cache_used(jax.devices()[0].client)}
    except Exception:
        return {"cache_enabled": None}
