"""loss_log.json writer/reader with the reference's exact schema, resumable merge, and curve PNG.

Schema (``addlrSD.py:78-83``):
``{"step": [...], "train_mse": [...], "ema": [...], "val_step": [...], "val_mse": [...],
"val_l1": [...], "val_ssim": [...]}`` — kept byte-compatible so the reference's committed
``Outputs_overfit/**/loss_log.json`` runs (BASELINE.md table) can be compared directly
against ours with the same tooling.
"""
from __future__ import annotations

import json
from pathlib import Path

_KEYS = ("step", "train_mse", "ema", "val_step", "val_mse", "val_l1", "val_ssim")


def new_loss_log() -> dict:
    return {k: [] for k in _KEYS}


def load_loss_log(path: str | Path) -> dict:
    """Resumable load — merge semantics of ``_load_loss_log`` (``addlrSD.py:72-83``): missing
    file → empty log; present → existing lists are continued."""
    p = Path(path)
    if not p.exists():
        return new_loss_log()
    data = json.loads(p.read_text())
    log = new_loss_log()
    for k in _KEYS:
        log[k] = list(data.get(k, []))
    return log


def trim_to_step(log: dict, step: int) -> dict:
    """Drop rows recorded past ``step`` — call after a checkpoint resume so the re-run
    steps don't duplicate rows (the reference's ``_load_loss_log`` merge semantics,
    ``addlrSD.py:72-83``; VERDICT r3 found the committed prompt_adherence log carried
    8,000 train rows for a 6,000-step run). Mutates and returns ``log``."""
    keep_t = sum(1 for s in log["step"] if s <= step)
    for k in ("step", "train_mse", "ema"):
        del log[k][keep_t:]
    keep_v = sum(1 for s in log["val_step"] if s <= step)
    for k in ("val_step", "val_mse", "val_l1", "val_ssim"):
        del log[k][min(keep_v, len(log[k])):]
    return log


def repair_loss_log(log: dict) -> dict:
    """Reconstruct a log polluted by pre-fix resumes: scan train rows in recorded order;
    whenever the step counter goes backwards (a resume re-ran from an earlier step),
    discard the earlier rows the resume superseded. Returns a new clean log."""
    out = new_loss_log()
    for i, s in enumerate(log["step"]):
        while out["step"] and out["step"][-1] >= s:
            trim_to_step(out, s - 1)
        out["step"].append(s)
        out["train_mse"].append(log["train_mse"][i])
        out["ema"].append(log["ema"][i])
    seen = {}
    for i, s in enumerate(log["val_step"]):  # later duplicate wins (post-resume re-measure)
        seen[s] = {k: (log[k][i] if i < len(log[k]) else None)
                   for k in ("val_mse", "val_l1", "val_ssim")}
    for s in sorted(seen):
        out["val_step"].append(s)
        for k in ("val_mse", "val_l1", "val_ssim"):
            if seen[s][k] is not None:
                out[k].append(seen[s][k])
    return out


def append_train(log: dict, step: int, train_mse: float, ema: float) -> None:
    log["step"].append(int(step))
    log["train_mse"].append(float(train_mse))
    log["ema"].append(float(ema))


def append_val(log: dict, step: int, val_mse: float, val_l1: float | None = None, val_ssim: float | None = None) -> None:
    log["val_step"].append(int(step))
    log["val_mse"].append(float(val_mse))
    if val_l1 is not None:
        log["val_l1"].append(float(val_l1))
    if val_ssim is not None:
        log["val_ssim"].append(float(val_ssim))


def save_loss_log(log: dict, path: str | Path) -> None:
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(log))


def save_loss_curve(log: dict, path: str | Path) -> None:
    """Log-scale train/val curve PNG (``addlrSD.py:89-104``). No-op if matplotlib is absent."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    fig, ax = plt.subplots(figsize=(8, 5))
    if log["step"]:
        ax.plot(log["step"], log["train_mse"], label="train_mse", alpha=0.4)
        ax.plot(log["step"], log["ema"], label="ema", lw=2)
    if log["val_step"]:
        ax.plot(log["val_step"], log["val_mse"], "o-", label="val_mse")
    ax.set_yscale("log")
    ax.set_xlabel("step")
    ax.set_ylabel("mse")
    ax.legend()
    fig.tight_layout()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=110)
    plt.close(fig)
