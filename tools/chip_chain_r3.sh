#!/bin/bash
# Round-3 chip job chain: runs after the VAE pretrain finishes (waits on its pid).
# seg U-Net -> prompt-adherence phase 1 (eps-MSE warm) -> phase 2 (maskloss).
# Each stage logs into its run dir; the chain stops on first failure.
set -e
cd /root/repo

VAE_PID=$(cat /tmp/vae.pid)
while kill -0 "$VAE_PID" 2>/dev/null; do sleep 30; done
VAE=runs/vae_pretrain/vae_step3500.npz
if [ ! -f "$VAE" ]; then echo "FATAL: $VAE missing after VAE run" >&2; exit 1; fi
echo "=== VAE done; starting seg U-Net $(date -u +%H:%M:%S) ==="

mkdir -p runs/seg_unet
python -m topomap_tpu.cli.main train-seg --data data/synth_pa/pairs.jsonl \
  --out runs/seg_unet --steps 1200 --batch 8 --crop 256 --log-every 100 \
  --val-every 400 > runs/seg_unet/run.log 2>&1
echo "=== seg done; starting phase-1 warm $(date -u +%H:%M:%S) ==="

mkdir -p runs/prompt_adherence
python -m topomap_tpu.cli.main train --preset prompt_adherence_warm \
  --data data/synth_pa/pairs.jsonl --out runs/prompt_adherence \
  --vae-ckpt "$VAE" --steps 6000 --log-every 100 --prefetch 2 \
  > runs/prompt_adherence/phase1.log 2>&1
echo "=== phase 1 done; starting phase-2 maskloss $(date -u +%H:%M:%S) ==="

python -m topomap_tpu.cli.main train --preset prompt_adherence \
  --data data/synth_pa/pairs.jsonl --out runs/prompt_adherence \
  --vae-ckpt "$VAE" --steps 16000 --log-every 100 --prefetch 2 \
  > runs/prompt_adherence/phase2.log 2>&1
echo "=== chain complete $(date -u +%H:%M:%S) ==="
