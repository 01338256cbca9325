"""Orbax checkpointing: collection-wise save/restore with auto-resume.

The reference saves **filtered** torch state dicts every VAL_EVERY (adapter full; ControlNet
subset by key substring; UNet subset by ``.A.``/``.B.``; ``addlrSD.py:533-543,551-561``) and
"resumes" by hand-editing ``global_step`` (``maskloss.py:371-373,531``). Here:

* the whole TrainState (param collections + optimizer state + step) checkpoints atomically
  via Orbax,
* ``save_filtered`` writes the reference-style per-collection trainable subsets (adapter /
  ctrl-ft / unet-lora) for interchange and A/B tooling,
* ``restore_latest`` auto-resumes from the newest step — the failure-recovery mechanism the
  reference lacks (SURVEY.md §5).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

Params = dict[str, Any]


_MANAGERS: dict[tuple[str, int], Any] = {}


def _mgr(directory: str | Path, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    path = str(Path(directory).absolute())
    key = (path, max_to_keep)  # retention options are baked into the manager
    if key not in _MANAGERS:
        stale = [k for k in _MANAGERS if k[0] == path and k != key]
        for k in stale:  # same dir, different retention: retire the old manager
            _MANAGERS.pop(k).wait_until_finished()
        _MANAGERS[key] = ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
    return _MANAGERS[key]


def save_train_state(
    directory: str | Path, state, step: int, max_to_keep: int = 3, wait: bool = True
) -> None:
    """Checkpoint the TrainState. ``wait=False`` returns as soon as the on-device arrays are
    snapshotted and lets Orbax write to disk in the background (async checkpointing) — the
    training loop continues while serialization happens. Call :func:`wait_for_checkpoints`
    (or the next ``wait=True`` save) before reading the files."""
    import orbax.checkpoint as ocp

    mgr = _mgr(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave({"params": state.params, "opt_state": state.opt_state}))
    if wait:
        mgr.wait_until_finished()


def wait_for_checkpoints(directory: str | Path | None = None) -> None:
    """Block until pending async checkpoint writes complete (all directories when None)."""
    if directory is not None:
        path = str(Path(directory).absolute())
        for (p, _), mgr in _MANAGERS.items():
            if p == path:
                mgr.wait_until_finished()
        return
    for mgr in _MANAGERS.values():
        mgr.wait_until_finished()


def restore_latest(directory: str | Path, state, to_host: bool = False):
    """Restore the newest checkpoint into the given (template) TrainState; returns
    (state, step) — (state, 0) untouched when no checkpoint exists.

    ``to_host=True`` restores onto host-memory numpy buffers instead of the template's
    device placement. With an on-device template, Orbax materializes a SECOND full
    on-device copy of params+opt_state during restore — on a 1.3B-param bundle that
    doubles HBM pressure and OOM'd the v5e on resume (round-3 chip chain). The host
    tree flows back to the device on its first jitted use (one transfer), so callers
    pay no steady-state cost; they must just drop their own references to the device
    template so it can be freed before that first dispatch."""
    import orbax.checkpoint as ocp
    import dataclasses
    import jax.numpy as jnp

    mgr = _mgr(directory)
    step = mgr.latest_step()
    if step is None:
        return state, 0
    template = {"params": state.params, "opt_state": state.opt_state}
    if to_host:
        template = jax.tree.map(
            lambda x: np.zeros(np.shape(x), x.dtype) if hasattr(x, "dtype") else x,
            template,
        )
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    state = dataclasses.replace(
        state,
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=jnp.asarray(step, jnp.int32),
    )
    return state, step


# ---------------------------------------------------------------------------
# Reference-style filtered checkpoints (.npz interchange)
# ---------------------------------------------------------------------------


def _flatten(tree: Params, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}/{k}")
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{path}/{i}")
        else:
            out[path.lstrip("/")] = np.asarray(node)

    walk(tree, prefix)
    return out


def _unflatten_into(tree: Params, flat: dict[str, np.ndarray]) -> Params:
    import copy
    import jax.numpy as jnp

    def _descend(node, p):
        if isinstance(node, (list, tuple)):
            return node[int(p)]
        if p in node:
            return node[p]
        return node[int(p)]  # LoRA trees key blocks by int

    def _cast(val, ref):
        # Committed interchange artifacts may be stored fp16 to halve the repo cost
        # (e.g. the pretrained-VAE overlay); upcast to the template's compute dtype.
        v = jnp.asarray(val)
        if (v.dtype == jnp.float16 and hasattr(ref, "dtype")
                and jnp.issubdtype(ref.dtype, jnp.floating)):
            return v.astype(ref.dtype)
        return v

    out = copy.deepcopy(tree)
    for key, val in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = _descend(node, p)
        last = parts[-1]
        if isinstance(node, (list, tuple)):
            node[int(last)] = _cast(val, node[int(last)])
        elif last in node:
            node[last] = _cast(val, node[last])
        else:
            node[int(last)] = _cast(val, node[int(last)])
    return out


FILTERED_COLLECTIONS = ("adapter", "ctrl_lora", "unet_lora")


def _atomic_savez(path: Path, arrays: dict) -> None:
    """Write an .npz via a temp file + os.rename so readers (and the disaster-recovery
    restore) never observe a partially-written snapshot — a container reset mid-save
    previously left torn step-N files that resumed with stale collections (ADVICE r4)."""
    import os

    # must end in .npz or np.savez appends the suffix; step-regex parsers skip ".tmp.npz"
    tmp = path.with_suffix(".tmp.npz")
    np.savez(tmp, **arrays)
    os.rename(tmp, path)


def save_filtered(directory: str | Path, params: Params, step: int, labeler=None,
                  keep_last: int = 3) -> list[Path]:
    """Write per-collection .npz subsets mirroring the reference's filtered torch.save set:
    textenc-adapter / ctrlora-ft (LoRA + zero_convs/middle_block_out/norm when a labeler is
    given) / unet-lora (``addlrSD.py:533-543``).

    ``keep_last``: retention matching the Orbax manager's max_to_keep — older per-step
    snapshots beyond the newest N are deleted (each set is ~31 MB; unbounded growth was
    ADVICE r3). ``keep_last=0`` disables cleanup."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    if keep_last:
        import re

        steps_seen = set()
        for f in directory.glob("*_step*.npz"):
            m = re.search(r"_step(\d+)\.npz$", f.name)
            if m:
                steps_seen.add(int(m.group(1)))
        for old in sorted(s for s in steps_seen if s != step)[: -max(keep_last - 1, 0) or None]:
            for f in directory.glob(f"*_step{old}.npz"):
                f.unlink()
    written = []
    for coll in FILTERED_COLLECTIONS:
        if coll not in params or params[coll] is None:
            continue
        flat = _flatten(params[coll])
        path = directory / f"{coll}_step{step}.npz"
        _atomic_savez(path, flat)
        written.append(path)
    if labeler is not None and "controlnet" in params:
        from topomap_tpu.train.optim import _path_str

        flatp = jax.tree_util.tree_flatten_with_path(params["controlnet"])[0]
        subset = {
            _path_str(p): np.asarray(v)
            for p, v in flatp
            if labeler("controlnet/" + _path_str(p)) is not None
        }
        if subset:
            path = directory / f"controlnet_ft_step{step}.npz"
            _atomic_savez(path, subset)
            written.append(path)
    return written


def restore_from_filtered(directory: str | Path, state):
    """Disaster-recovery resume: overlay the newest filtered npz set onto a fresh
    TrainState when the Orbax directory is gone (container resets wipe uncommitted
    ``runs/*/ckpt`` while the small filtered npz are committed). Restores every
    trainable collection present on disk — ``adapter``/``ctrl_lora``/``unet_lora``
    plus the labeler-filtered ``controlnet_ft`` subset — and sets ``state.step``.
    Optimizer moments are NOT recovered (they are only in the Orbax state); returns
    ``(state, 0)`` untouched when the directory holds no snapshots."""
    import dataclasses
    import re

    import jax.numpy as jnp

    directory = Path(directory)
    by_step: dict[int, set[str]] = {}
    for f in directory.glob("*_step*.npz"):
        m = re.search(r"^(.+)_step(\d+)\.npz$", f.name)
        if m and f.stat().st_size:
            by_step.setdefault(int(m.group(2)), set()).add(m.group(1))
    if not by_step:
        return state, 0
    # Resume the newest step with a COMPLETE collection set. save_filtered writes the
    # collections one file at a time; a reset mid-save leaves step N with a subset, and
    # resuming it would silently continue with the missing trainables at fresh init
    # (ADVICE r4 medium). "Complete" = the union of collection names seen across steps.
    expected = set().union(*by_step.values())
    complete = [s for s, colls in by_step.items() if colls == expected]
    step = max(complete) if complete else max(by_step)
    params = state.params
    for coll in FILTERED_COLLECTIONS:
        path = directory / f"{coll}_step{step}.npz"
        if path.exists() and path.stat().st_size and params.get(coll) is not None:
            params = load_filtered(params, path, coll)
    cn_path = directory / f"controlnet_ft_step{step}.npz"
    if cn_path.exists() and cn_path.stat().st_size and "controlnet" in params:
        params = load_filtered(params, cn_path, "controlnet")
    state = dataclasses.replace(state, params=params, step=jnp.asarray(step, jnp.int32))
    return state, step


def load_filtered(params: Params, path: str | Path, collection: str) -> Params:
    """Overlay a filtered .npz onto one collection (the reference's overlay-load,
    ``quantitative_metrics.py:44-55``)."""
    flat = dict(np.load(path))
    out = dict(params)
    out[collection] = _unflatten_into(params[collection], flat)
    return out


def latest_filtered_step(directory: str | Path) -> int:
    """Newest step number with any non-empty filtered npz under ``directory`` (0 if none) —
    used to detect a stale Orbax dir shadowing newer committed filtered state (ADVICE r4)."""
    import re

    best = 0
    for f in Path(directory).glob("*_step*.npz"):
        m = re.search(r"_step(\d+)\.npz$", f.name)
        if m and f.stat().st_size:
            best = max(best, int(m.group(1)))
    return best


# ---------------------------------------------------------------------------
# Base-trunk artifacts (full-trunk pretraining, OptimConfig config_name="full")
# ---------------------------------------------------------------------------

BASE_COLLECTIONS = ("unet", "controlnet", "adapter", "bert")


def save_base_npz(directory: str | Path, params: Params, step: int,
                  keep_last: int = 1) -> Path:
    """Write the trained BASE trunk (unet + controlnet + adapter, the ``full`` labeler's
    trainable set) as ONE fp16 .npz — the repo's interchange equivalent of the reference's
    ``Swisstopo.ckpt`` (``addlrSD.py:288-291``), consumable via ``--base-npz``.

    fp16 halves the ~4.9 GB fp32 payload; ``load_base_npz``/``_unflatten_into`` upcast on
    load (same contract as the committed VAE overlay). Written atomically (tmp+rename);
    per-step files beyond the newest ``keep_last`` are deleted (each is ~2.4 GB)."""
    import re

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    # one batched device->host gather (per-leaf np.asarray through the remote-TPU tunnel
    # would serialize ~1900 round trips)
    host = jax.device_get({c: params[c] for c in BASE_COLLECTIONS if params.get(c) is not None})
    flat: dict[str, np.ndarray] = {}
    for coll, tree in host.items():
        for k, v in _flatten(tree, coll).items():
            arr = np.asarray(v)
            flat[k] = arr.astype(np.float16) if arr.dtype == np.float32 else arr
    path = directory / f"base_step{step}.npz"
    _atomic_savez(path, flat)
    if keep_last:
        steps_seen = set()
        for f in directory.glob("base_step*.npz"):
            m = re.search(r"base_step(\d+)\.npz$", f.name)
            if m:
                steps_seen.add(int(m.group(1)))
        for old in sorted(steps_seen - {step})[:-max(keep_last - 1, 0) or None]:
            (directory / f"base_step{old}.npz").unlink(missing_ok=True)
    return path


def load_base_npz(params: Params, path: str | Path) -> Params:
    """Overlay a ``save_base_npz`` artifact (collection-prefixed keys) onto the pipeline
    tree; fp16 payloads upcast to each leaf's dtype."""
    flat = dict(np.load(path))
    out = dict(params)
    for coll in BASE_COLLECTIONS:
        sub = {k[len(coll) + 1:]: v for k, v in flat.items() if k.startswith(coll + "/")}
        if sub and out.get(coll) is not None:
            out[coll] = _unflatten_into(out[coll], sub)
    return out


def restore_from_base_npz(directory: str | Path, state):
    """Disaster-recovery resume for full-trunk runs: overlay the newest ``base_step*.npz``
    and set ``state.step`` (optimizer state restarts fresh, as in ``restore_from_filtered``)."""
    import dataclasses
    import re

    import jax.numpy as jnp

    directory = Path(directory)
    best = None
    for f in directory.glob("base_step*.npz"):
        m = re.search(r"base_step(\d+)\.npz$", f.name)
        if m and f.stat().st_size:
            s = int(m.group(1))
            if best is None or s > best[0]:
                best = (s, f)
    if best is None:
        return state, 0
    step, path = best
    params = load_base_npz(state.params, path)
    state = dataclasses.replace(state, params=params, step=jnp.asarray(step, jnp.int32))
    return state, step
