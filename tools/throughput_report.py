"""Reconcile real-run training throughput against the benched dispatch rate (VERDICT r3
weak #2 / next #8): where does the wall clock of a committed run actually go?

Reads a run's ``throughput.jsonl`` (schema v2: cumulative ``data_wait_s`` /
``dispatch_s`` / ``val_ckpt_s`` buckets per row — ``cli/main.py`` run_chunk) and reports
per-interval optimizer-steps/s plus the share of wall time per phase. Container resets
show up as intervals whose wall delta vastly exceeds the sum of tracked buckets; those
are split out as ``untracked`` so the steady-state rate is not polluted by relaunch
compile time (the failure mode that produced the unreconciled 6.64-vs-1.9 steps/s gap).

Usage: RUN=runs/prompt_adherence python tools/throughput_report.py   (JSON on stdout)
"""
import json
import os
import statistics
import sys
from pathlib import Path

BUCKET_KEYS = ("data_wait_s", "dispatch_s", "val_ckpt_s")


def load_rows(path: Path) -> list[dict]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def intervals(rows: list[dict]) -> list[dict]:
    """Per-interval deltas between consecutive rows that both carry bucket fields."""
    out = []
    for a, b in zip(rows, rows[1:]):
        if not all(k in a and k in b for k in BUCKET_KEYS):
            continue
        dt = b["time"] - a["time"]
        dstep = b["step"] - a["step"]
        if dt <= 0 or dstep <= 0:
            continue  # resume overlap / clock reset
        tracked = {k: b[k] - a[k] for k in BUCKET_KEYS}
        tsum = sum(tracked.values())
        if any(v < 0 for v in tracked.values()):
            continue  # relaunch reset the cumulative counters mid-file
        out.append({
            "step": b["step"], "wall_s": dt, "steps": dstep,
            "steps_per_sec": dstep / dt, **tracked,
            # wall time the buckets cannot account for: compile on relaunch, container
            # pauses, host GC. Large values isolate non-steady intervals.
            "untracked_s": max(dt - tsum, 0.0),
        })
    return out


def report(run: Path) -> dict:
    rows = load_rows(run / "throughput.jsonl")
    ivs = intervals(rows)
    # steady state = intervals where tracked phases explain >=80% of the wall clock
    steady = [iv for iv in ivs if iv["untracked_s"] <= 0.2 * iv["wall_s"]]
    pick = steady or ivs

    def share(key):
        tot = sum(iv["wall_s"] for iv in pick)
        return sum(iv[key] for iv in pick) / tot if tot else 0.0

    rates = [iv["steps_per_sec"] for iv in pick]
    out = {
        "run": str(run),
        "rows": len(rows),
        "intervals": len(ivs),
        "steady_intervals": len(steady),
        "steady_steps_per_sec_median": round(statistics.median(rates), 4) if rates else None,
        "steady_steps_per_sec_best": round(max(rates), 4) if rates else None,
        "share": {k: round(share(k), 4) for k in (*BUCKET_KEYS, "untracked_s")},
        # dispatch-only ceiling: the rate if host data/val/ckpt time were fully hidden —
        # directly comparable to the benched scan-dispatch number (BENCH_NOTES train row)
        "dispatch_only_steps_per_sec": (
            round(sum(iv["steps"] for iv in pick) / sum(iv["dispatch_s"] for iv in pick), 4)
            if pick and sum(iv["dispatch_s"] for iv in pick) > 0 else None
        ),
    }
    return out


if __name__ == "__main__":
    run = Path(os.environ.get("RUN", "runs/prompt_adherence"))
    if not (run / "throughput.jsonl").exists():
        print(f"no throughput.jsonl under {run}", file=sys.stderr)
        sys.exit(2)
    print(json.dumps(report(run)))
