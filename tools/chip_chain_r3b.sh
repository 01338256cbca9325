#!/bin/bash
# Round-3 chip chain, part b (VAE already done): seg U-Net -> phase-1 warm -> phase-2
# maskloss. Restarted after fixing the eager per-step mask extraction in train-seg.
set -e
cd /root/repo
VAE=runs/vae_pretrain/vae_step3500.npz

echo "=== seg U-Net $(date -u +%H:%M:%S) ==="
python -m topomap_tpu.cli.main train-seg --data data/synth_pa/pairs.jsonl \
  --out runs/seg_unet --steps 1200 --batch 8 --crop 256 --log-every 100 \
  --val-every 400 > runs/seg_unet/run.log 2>&1
echo "=== seg done; phase-1 warm $(date -u +%H:%M:%S) ==="

mkdir -p runs/prompt_adherence
python -m topomap_tpu.cli.main train --preset prompt_adherence_warm \
  --data data/synth_pa/pairs.jsonl --out runs/prompt_adherence \
  --vae-ckpt "$VAE" --steps 6000 --log-every 100 --prefetch 2 \
  > runs/prompt_adherence/phase1.log 2>&1
echo "=== phase 1 done; phase-2 maskloss $(date -u +%H:%M:%S) ==="

python -m topomap_tpu.cli.main train --preset prompt_adherence \
  --data data/synth_pa/pairs.jsonl --out runs/prompt_adherence \
  --vae-ckpt "$VAE" --steps 16000 --log-every 100 --prefetch 2 \
  > runs/prompt_adherence/phase2.log 2>&1
echo "=== chain complete $(date -u +%H:%M:%S) ==="
