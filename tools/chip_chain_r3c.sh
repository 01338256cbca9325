#!/bin/bash
# Round-3 chip chain, part c: phase-1 warm + phase-2 maskloss prompt-adherence training.
# Part b's phase-1 launch OOM'd the chip (batch 4, no remat); this uses the configuration
# the train bench has already proven on-chip (batch 2 + remat, bench.py bench_train),
# with scan-8 to amortize remote-tunnel dispatch.
set -e
cd /root/repo
VAE=runs/vae_pretrain/vae_step3500.npz

mkdir -p runs/prompt_adherence
echo "=== phase-1 warm $(date -u +%H:%M:%S) ==="
python -m topomap_tpu.cli.main train --preset prompt_adherence_warm \
  --data data/synth_pa/pairs.jsonl --out runs/prompt_adherence \
  --vae-ckpt "$VAE" --steps 6000 --batch 2 --remat --scan-steps 8 \
  --log-every 200 --prefetch 2 \
  > runs/prompt_adherence/phase1.log 2>&1
echo "=== phase 1 done; phase-2 maskloss $(date -u +%H:%M:%S) ==="

python -m topomap_tpu.cli.main train --preset prompt_adherence \
  --data data/synth_pa/pairs.jsonl --out runs/prompt_adherence \
  --vae-ckpt "$VAE" --steps 16000 --batch 2 --remat --scan-steps 8 \
  --log-every 200 --prefetch 2 \
  > runs/prompt_adherence/phase2.log 2>&1
echo "=== chain complete $(date -u +%H:%M:%S) ==="
