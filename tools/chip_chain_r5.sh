#!/bin/bash
# Round-5 chip chain — text-pathway adherence push. Round-4 evidence: phase-2 maskloss
# improved image fidelity (MSE vs GT 2.3x better, MIoU 2x) but BOTH adherence evals were
# null (matched-vs-shuffled ratio ~1.0, even in the overfit lab where the prompt is the
# only disambiguator) -> the under-optimized link is the text pathway of the
# from-scratch base. The lever (prompt_adherence_text preset): 10% CFG prompt dropout
# (train the uncond branch the reference inherits from pretrained SD1.5) + 4x LRs on
# adapter/unet_lora. Stage order validates the lever CHEAPLY before spending chip-hours:
#   0. datasets (seed-pinned regeneration after container wipes)
#   1. overfit-text lab: 2 tiles x 10 prompts, 8k steps -- if the conditioning pathway
#      can bind text at all, it must show here first (ratio << 1 expected)
#   2. full-scale phase 3: resume runs/prompt_adherence 16k -> 26k with the text preset
#   3. adherence eval on the phase-3 checkpoint
#   4. consistency distillation from the newest checkpoint (resumable)
#   5. student quality vs its trained teacher
# Idempotent: artifact-gated stages, 0-byte husks treated as absent, training resumes.
cd /root/repo || exit 1
export VAE=runs/vae_pretrain/vae_final_fp16.npz
export PA_DATA=data/synth_pa/pairs.jsonl
export PA_TRAIN_DATA=data/synth_pa2/pairs.jsonl
export PA_RUN=runs/prompt_adherence
export OFT_DATA=data/synth_overfit/pairs.jsonl
export OFT_RUN=runs/overfit_text

stage() {
  local name=$1 artifact=$2 cmd=$3
  if [ -f "$artifact" ] && [ ! -s "$artifact" ]; then rm -f "$artifact"; fi
  if [ -s "$artifact" ] || [ -d "$artifact" ]; then
    echo "=== $name: SKIP (artifact $artifact exists) $(date -u +%H:%M:%S)"
    return 0
  fi
  echo "=== $name: START $(date -u +%H:%M:%S)"
  bash -c "$cmd"
  local rc=$?
  echo "=== $name: rc=$rc $(date -u +%H:%M:%S)"
  return $rc
}

mkdir -p "$OFT_RUN" "$PA_RUN/eval_phase3" runs/distill_pa

stage make_data_pa data/synth_pa/pairs.jsonl '
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 3600 \
    python -m topomap_tpu.cli.main make-data --out data/synth_pa --tiles 32 --seed 0'

stage make_data_pa2 data/synth_pa2/pairs.jsonl '
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 7200 \
    python -m topomap_tpu.cli.main make-data --out data/synth_pa2 --tiles 128 --seed 1000'

stage make_data_overfit "$OFT_DATA" '
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 1800 \
    python -m topomap_tpu.cli.main make-data --out data/synth_overfit --tiles 2 --seed 5000'

# 1. lever validation: overfit lab under the text preset. 8k steps (the r4 lab showed
#    5k reaches stable color statistics; dropout slows memorization slightly).
stage overfit_text_train "$OFT_RUN/ckpt/8000" '
  timeout 10800 python -m topomap_tpu.cli.main train --preset prompt_adherence_text \
    --data $OFT_DATA --out $OFT_RUN \
    --vae-ckpt $VAE --steps 8000 --batch 1 --remat --scan-steps 8 \
    --maskloss-warmup 500 --full-ckpt-every 8000 --val-every 1000 \
    --log-every 200 --prefetch 2 \
    >> $OFT_RUN/train.log 2>&1'

stage overfit_text_eval "$OFT_RUN/eval/adherence_report.json" '
  mkdir -p $OFT_RUN/eval
  RUN=$OFT_RUN DATA=$OFT_DATA PER_PROMPT=2 STEPS=20 OUT=$OFT_RUN/eval \
    timeout 5400 python tools/prompt_adherence_eval.py \
    > $OFT_RUN/eval/eval.log 2>&1'

# 2. full-scale phase 3: resume the 16k checkpoint under the text preset (same config3
#    labeler/groups -> optimizer state restores; LRs live in the schedule).
stage phase3_text "$PA_RUN/ckpt/26000" '
  timeout 18000 python -m topomap_tpu.cli.main train --preset prompt_adherence_text \
    --data $PA_TRAIN_DATA --out $PA_RUN \
    --vae-ckpt $VAE --steps 26000 --batch 1 --remat --scan-steps 8 \
    --full-ckpt-every 5000 \
    --log-every 200 --prefetch 2 \
    >> $PA_RUN/phase3.log 2>&1'

stage adherence_eval_p3 "$PA_RUN/eval_phase3/adherence_report.json" '
  RUN=$PA_RUN DATA=$PA_DATA PER_PROMPT=4 STEPS=20 OUT=$PA_RUN/eval_phase3 \
    timeout 7200 python tools/prompt_adherence_eval.py \
    > $PA_RUN/eval_phase3/eval.log 2>&1'

# 4. consistency distillation from the newest trained checkpoint (VERDICT r3 #3)
stage distill_pa runs/distill_pa/unet_lora_step10000.npz '
  timeout 18000 python -m topomap_tpu.cli.main distill --preset prompt_adherence \
    --ckpt $PA_RUN --vae-ckpt $VAE --data $PA_TRAIN_DATA \
    --out runs/distill_pa --mode consistency --steps 10000 \
    --batch 2 --remat --scan-steps 8 --log-every 200 --save-every 1000 \
    >> runs/distill_pa/run.log 2>&1'

stage student_quality runs/distill_pa/student_quality.json '
  DISTILL_RUN=runs/distill_pa RUN=$PA_RUN DATA=$PA_DATA \
      PRESET=prompt_adherence BATCH=2 STUDENT_STEPS=2,4,8 \
    timeout 7200 python tools/student_quality.py \
    > runs/distill_pa/student_quality.json.tmp 2> runs/distill_pa/student_quality.log \
  && [ -s runs/distill_pa/student_quality.json.tmp ] \
  && mv runs/distill_pa/student_quality.json.tmp runs/distill_pa/student_quality.json'

echo "=== chain r5 complete $(date -u +%H:%M:%S)"
