#!/bin/bash
# Round-3 chip chain, part d — runs after part c (prompt-adherence phases 1+2) completes:
#   1. prompt-adherence image-level eval (VERDICT r2 #1 artifact),
#   2. production-length consistency distillation FROM the real checkpoint (VERDICT #2),
#   3. saved-student quality on real tiles (VERDICT #2 quality column),
#   4. approximation-ladder fidelity on the real checkpoint (VERDICT #3),
#   5. exact-path MFU accounting w/ same-session GEMM ceiling (VERDICT #5),
#   6. BENCH_CFG_FORK=0 bench leg (VERDICT #6 A/B; fork-on is the driver bench).
# Each step logs independently; a failure does not kill the rest (no set -e here).
cd /root/repo
VAE=runs/vae_pretrain/vae_step3500.npz
DATA=data/synth_pa/pairs.jsonl

if [ -f /tmp/chain_r3c.pid ]; then
  while kill -0 "$(cat /tmp/chain_r3c.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== adherence eval $(date -u +%H:%M:%S) ==="
RUN=runs/prompt_adherence DATA=$DATA PER_PROMPT=4 STEPS=20 \
  timeout 3600 python tools/prompt_adherence_eval.py \
  > runs/prompt_adherence/adherence_eval.log 2>&1

echo "=== distill from real ckpt $(date -u +%H:%M:%S) ==="
mkdir -p runs/distill_pa
timeout 14400 python -m topomap_tpu.cli.main distill --preset prompt_adherence \
  --ckpt runs/prompt_adherence --vae-ckpt "$VAE" --data $DATA \
  --out runs/distill_pa --mode consistency --steps 10000 \
  --batch 2 --remat --scan-steps 8 --log-every 200 --save-every 2000 \
  > runs/distill_pa/run.log 2>&1

echo "=== student quality $(date -u +%H:%M:%S) ==="
RUN=runs/prompt_adherence PRESET=prompt_adherence VAE="" DISTILL_RUN=runs/distill_pa \
  DATA=$DATA SIZE=512 BATCH=2 STUDENT_STEPS=1,2,4,8 \
  timeout 3600 python tools/student_quality.py \
  > runs/distill_pa/student_quality.json 2> runs/distill_pa/student_quality.log

echo "=== approx ladder on real ckpt $(date -u +%H:%M:%S) ==="
RUN=runs/prompt_adherence PRESET=prompt_adherence DATA=$DATA BATCH=2 \
  timeout 3600 python tools/approx_quality.py \
  > runs/prompt_adherence/approx_quality.json 2> runs/prompt_adherence/approx_quality.log

echo "=== MFU accounting $(date -u +%H:%M:%S) ==="
timeout 3600 python tools/mfu_accounting.py \
  > /tmp/mfu_accounting.json 2> /tmp/mfu_accounting.log

echo "=== bench fork-off A/B leg $(date -u +%H:%M:%S) ==="
BENCH_CFG_FORK=0 timeout 1800 python bench.py \
  > /tmp/bench_fork_off.json 2> /tmp/bench_fork_off.log

echo "=== chain d complete $(date -u +%H:%M:%S) ==="
