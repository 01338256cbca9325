#!/bin/bash
# Round-3 chip chain, part e — container-reset recovery relaunch of c+d with the
# committed VAE artifact name (vae_final_fp16.npz; the step3500 alias was lost with
# the reset) and the dataset regenerated via `make-data --out data/synth_pa --tiles 32`.
# Stages (serialized on the one chip):
#   1. prompt-adherence phase 1 (eps-MSE warm, 6k steps, batch 2 + remat + scan 25)
#   2. phase 2 (maskloss on, resume to 16k)
#   3. image-level adherence eval (VERDICT r2 #1 artifact)
#   4. approximation-ladder fidelity on the real ckpt (VERDICT #3)
#   5. exact-path MFU accounting w/ same-session GEMM ceiling (VERDICT #5)
#   6. consistency distillation FROM the real ckpt for whatever time remains
#      (save-every 1000 so partial progress is a usable artifact; VERDICT #2)
# No set -e after phase 2: measurement stages log-and-continue.
cd /root/repo
VAE=runs/vae_pretrain/vae_final_fp16.npz
DATA=data/synth_pa/pairs.jsonl
set -e

mkdir -p runs/prompt_adherence
echo "=== phase-1 warm $(date -u +%H:%M:%S) ==="
# scan 25 = the exact program shape bench_train proved on this backend (6.64 steps/s);
# the first launch's scan-8 compile got SIGKILLed in the local compile-helper while the
# CPU-mesh test suite was running — keep the box quiet during compiles.
python -m topomap_tpu.cli.main train --preset prompt_adherence_warm \
  --data $DATA --out runs/prompt_adherence \
  --vae-ckpt "$VAE" --steps 6000 --batch 2 --remat --scan-steps 25 \
  --log-every 200 --prefetch 2 \
  > runs/prompt_adherence/phase1.log 2>&1

echo "=== phase-2 maskloss $(date -u +%H:%M:%S) ==="
python -m topomap_tpu.cli.main train --preset prompt_adherence \
  --data $DATA --out runs/prompt_adherence \
  --vae-ckpt "$VAE" --steps 16000 --batch 2 --remat --scan-steps 8 \
  --log-every 200 --prefetch 2 \
  > runs/prompt_adherence/phase2.log 2>&1

set +e
echo "=== adherence eval $(date -u +%H:%M:%S) ==="
RUN=runs/prompt_adherence DATA=$DATA PER_PROMPT=4 STEPS=20 \
  timeout 3600 python tools/prompt_adherence_eval.py \
  > runs/prompt_adherence/adherence_eval.log 2>&1

echo "=== approx ladder on real ckpt $(date -u +%H:%M:%S) ==="
RUN=runs/prompt_adherence PRESET=prompt_adherence DATA=$DATA BATCH=2 \
  timeout 3600 python tools/approx_quality.py \
  > runs/prompt_adherence/approx_quality.json 2> runs/prompt_adherence/approx_quality.log

echo "=== MFU accounting $(date -u +%H:%M:%S) ==="
timeout 3600 python tools/mfu_accounting.py \
  > runs/prompt_adherence/mfu_accounting.json 2> runs/prompt_adherence/mfu_accounting.log

echo "=== distill from real ckpt $(date -u +%H:%M:%S) ==="
mkdir -p runs/distill_pa
timeout 14400 python -m topomap_tpu.cli.main distill --preset prompt_adherence \
  --ckpt runs/prompt_adherence --vae-ckpt "$VAE" --data $DATA \
  --out runs/distill_pa --mode consistency --steps 10000 \
  --batch 2 --remat --scan-steps 8 --log-every 200 --save-every 1000 \
  > runs/distill_pa/run.log 2>&1

echo "=== chain e complete $(date -u +%H:%M:%S) ==="
