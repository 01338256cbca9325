"""Shared teacher/base setup for the measurement tools (VERDICT r2 #10).

One place for the host-CPU init + overlay logic that ``distill512_check.py``,
``student_quality.py`` and ``approx_quality.py`` each re-implemented:

* ``simulate_pretrained`` config-3 base on the host CPU backend (eager remote-TPU init
  costs minutes — CLAUDE.md), with three optional overlays selected by env vars:
  - ``CKPT=path``  — an LDM ``.ckpt``/``.safetensors`` (reference key space);
  - ``RUN=dir``    — a training run directory (orbax checkpoint; LoRA/adapter merged via
    ``merge_for_sampling`` when ``merge=True``) — the round-3 "real checkpoint" path;
  - ``VAE=path``   — a ``pretrain-vae`` .npz first-stage overlay.
"""
import contextlib
import os
import sys
from pathlib import Path


def cpu_ctx():
    """(cpu_device_or_None, context manager placing inits on the host CPU backend)."""
    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        cpu = None
    dev = jax.devices()[0]
    use = cpu is not None and dev.platform != "cpu"
    return cpu, (jax.default_device(cpu) if use else contextlib.nullcontext())


def init_base(cfg, preset=None, merge: bool = False, drop_clip: bool = True):
    """Build the evaluation/teacher base tree on the host CPU backend.

    Returns ``(params, provenance)`` — params still on the host; callers ``device_put``
    once. ``preset`` (an ExperimentPreset) is required for ``RUN=`` restores so the
    optimizer partition matches the checkpointed train state.
    """
    import jax

    from topomap_tpu.pipeline import init_pipeline, merge_for_sampling, simulate_pretrained

    _, ctx = cpu_ctx()
    provenance = "simulated_pretrained"
    with ctx:
        base_npz = os.environ.get("BASE_NPZ")
        if base_npz:
            # Trained full-trunk base (save_base_npz artifact): init from the TRAINING
            # seed so the frozen text towers match the run's, overlay the trained trunk,
            # and do NOT simulate_pretrained (the base trained from raw init).
            from topomap_tpu.configs.presets import get_preset
            from topomap_tpu.utils.checkpoint import load_base_npz

            seed = (preset or get_preset(os.environ.get("PRESET", "base_pretrain"))).seed
            params = load_base_npz(init_pipeline(jax.random.PRNGKey(seed), cfg), base_npz)
            provenance = f"base:{base_npz}"
            print(f"overlaid base trunk {base_npz}", file=sys.stderr)
        else:
            params = simulate_pretrained(
                init_pipeline(jax.random.PRNGKey(0), cfg), jax.random.PRNGKey(1)
            )
        ckpt = os.environ.get("CKPT")
        run = os.environ.get("RUN")
        if ckpt:
            from topomap_tpu.utils.torch_ckpt import load_sd_checkpoint, read_torch_file

            params, rep = load_sd_checkpoint(params, cfg, read_torch_file(ckpt))
            print(f"loaded {ckpt}: {rep['loaded']} tensors", file=sys.stderr)
            provenance = f"ckpt:{ckpt}"
        elif run:
            from topomap_tpu.train.optim import build_optimizer
            from topomap_tpu.train.trainer import init_train_state
            from topomap_tpu.utils.checkpoint import restore_latest

            if preset is None:
                from topomap_tpu.configs.presets import get_preset

                preset = get_preset(os.environ.get("PRESET", "prompt_adherence"))
            tx, part = build_optimizer(params, preset.optim)
            state, step = restore_latest(Path(run) / "ckpt", init_train_state(params, tx, part))
            if not step:
                raise SystemExit(f"no checkpoint under {run}/ckpt")
            params = state.params
            print(f"restored {run} step {step}", file=sys.stderr)
            provenance = f"run:{run}@{step}"
        vae = os.environ.get("VAE")
        if vae:
            from topomap_tpu.utils.checkpoint import load_filtered

            params = load_filtered(params, vae, "vae")
            print(f"overlaid VAE {vae}", file=sys.stderr)
            provenance += "+vae"
        if merge:
            params = merge_for_sampling(params)
        if drop_clip:
            params.pop("clip", None)  # BERT+adapter text path only
    return params, provenance
