#!/bin/bash
# Round-5 chip chain — TRUNK FIRST (VERDICT r4 ask #1): every round-4 adherence run
# trained LoRA subsets on a frozen RANDOM 1.2B trunk, which cannot denoise; all three
# adherence evals were null and no committed preview shows map structure. The missing
# reference asset is the pretrained base itself (Swisstopo.ckpt, addlrSD.py:288-291).
# Stage order:
#   0. datasets (seed-pinned regeneration after container wipes)
#   1. base_overfit gate: 2 tiles, FULL-trunk training from raw init (preset
#      base_overfit: 'full' labeler + adafactor). A sound pipeline must near-memorize;
#      previews must reproduce the seg-hint polygons. CHEAP kill-switch before the
#      full-scale spend.
#   2. gate eval: adherence_report on the overfit base (miou_vs_seg_hint >= 0.5 = pass,
#      judged against the new miou_gt_tiles calibration row).
#   3. base_pretrain: full-scale trunk run on the 128-tile styled suite (the repo's
#      synthetic-Swisstopo artifact, fp16 base npz).
#   4. adherence eval on the trained base (matched-vs-shuffled ratio, reference contract
#      quantitative_metrics.py:198-245).
#   5. text-lever fine-tune ON TOP of the trained base (preset prompt_adherence_text,
#      config-3 trainables + CFG dropout — VERDICT r4 ask #2, now on a sound generator).
#   6. adherence eval on the fine-tuned model.
#   7. consistency distillation from the trained teacher + student quality table.
# Idempotent: artifact-gated stages, 0-byte husks treated as absent, training resumes.
cd /root/repo || exit 1
export VAE=runs/vae_pretrain/vae_final_fp16.npz
export OFT_DATA=data/synth_overfit/pairs.jsonl
export OFT_RUN=runs/base_overfit
export BASE_DATA=data/synth_pa2/pairs.jsonl
export BASE_RUN=runs/base_pretrain
export PA_DATA=data/synth_pa/pairs.jsonl
export FT_RUN=runs/pa_text

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

newest() { ls "$1"/base_step*.npz 2>/dev/null | sort -V | tail -1; }
export -f newest  # stages run under bash -c and need the helper

mkdir -p "$OFT_RUN" "$BASE_RUN" "$FT_RUN" runs/distill_base

stage make_data_pa data/synth_pa/pairs.jsonl '
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 3600 \
    python -m topomap_tpu.cli.main make-data --out data/synth_pa --tiles 32 --seed 0'

stage make_data_pa2 data/synth_pa2/pairs.jsonl '
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 7200 \
    python -m topomap_tpu.cli.main make-data --out data/synth_pa2 --tiles 128 --seed 1000'

stage make_data_overfit "$OFT_DATA" '
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 1800 \
    python -m topomap_tpu.cli.main make-data --out data/synth_overfit --tiles 2 --seed 5000'

# 1. full-trunk overfit gate (2 tiles, 8k steps)
stage overfit_base "$OFT_RUN/base/base_step8000.npz" '
  timeout 14400 python -m topomap_tpu.cli.main train --preset base_overfit \
    --data $OFT_DATA --out $OFT_RUN \
    --vae-ckpt $VAE --steps 8000 --batch 1 --remat --scan-steps 8 \
    --full-ckpt-every 2000 --val-every 500 --log-every 104 --prefetch 2 \
    >> $OFT_RUN/train.log 2>&1'

stage overfit_base_eval "$OFT_RUN/eval/adherence_report.json" '
  mkdir -p $OFT_RUN/eval
  BASE_NPZ=$(newest $OFT_RUN/base) VAE_CKPT=$VAE PRESET=base_overfit \
    RUN=$OFT_RUN DATA=$OFT_DATA PER_PROMPT=2 STEPS=20 OUT=$OFT_RUN/eval \
    timeout 5400 python tools/prompt_adherence_eval.py \
    > $OFT_RUN/eval/eval.log 2>&1'

# 3. full-scale base pretrain (128 styled tiles, resumable). Phase A: pure eps-MSE to
#    18k (fast, memory-light); phase B: resume with the masked color loss to 26k (the
#    prompt->class-color gradient; staged like the reference's maskloss resume).
stage base_pretrain_a "$BASE_RUN/base/base_step18000.npz" '
  timeout 21600 python -m topomap_tpu.cli.main train --preset base_pretrain \
    --data $BASE_DATA --out $BASE_RUN \
    --vae-ckpt $VAE --steps 18000 --batch 1 --remat --scan-steps 8 \
    --full-ckpt-every 6000 --val-every 1000 --log-every 200 --prefetch 2 \
    >> $BASE_RUN/train.log 2>&1'

stage base_pretrain_b "$BASE_RUN/base/base_step26000.npz" '
  timeout 14400 python -m topomap_tpu.cli.main train --preset base_pretrain_maskloss \
    --data $BASE_DATA --out $BASE_RUN \
    --vae-ckpt $VAE --steps 26000 --batch 1 --remat --scan-steps 8 \
    --full-ckpt-every 4000 --val-every 1000 --log-every 200 --prefetch 2 \
    >> $BASE_RUN/train.log 2>&1'

stage base_eval "$BASE_RUN/eval/adherence_report.json" '
  mkdir -p $BASE_RUN/eval
  BASE_NPZ=$(newest $BASE_RUN/base) VAE_CKPT=$VAE PRESET=base_pretrain \
    RUN=$BASE_RUN DATA=$PA_DATA PER_PROMPT=4 STEPS=20 OUT=$BASE_RUN/eval \
    timeout 7200 python tools/prompt_adherence_eval.py \
    > $BASE_RUN/eval/eval.log 2>&1'

# 5. text-pathway fine-tune ON TOP of the trained base (config-3 trainables)
stage ft_text "$FT_RUN/ckpt/4000" '
  timeout 10800 python -m topomap_tpu.cli.main train --preset prompt_adherence_text \
    --data $BASE_DATA --out $FT_RUN --base-npz $(newest $BASE_RUN/base) \
    --vae-ckpt $VAE --steps 4000 --batch 1 --remat --scan-steps 8 \
    --maskloss-warmup 0 --full-ckpt-every 2000 --val-every 500 \
    --log-every 200 --prefetch 2 \
    >> $FT_RUN/train.log 2>&1'

stage ft_text_eval "$FT_RUN/eval/adherence_report.json" '
  mkdir -p $FT_RUN/eval
  PRESET=prompt_adherence_text RUN=$FT_RUN DATA=$PA_DATA PER_PROMPT=4 STEPS=20 \
    OUT=$FT_RUN/eval \
    timeout 7200 python tools/prompt_adherence_eval.py \
    > $FT_RUN/eval/eval.log 2>&1'

# 7. consistency distillation from the trained teacher (VERDICT r3 #3 / r4 #4 redo
#    with a non-noise teacher) + student quality vs that teacher
stage distill_base runs/distill_base/unet_lora_step6000.npz '
  timeout 14400 python -m topomap_tpu.cli.main distill --preset prompt_adherence_text \
    --ckpt $FT_RUN --base-npz $(newest $BASE_RUN/base) --vae-ckpt $VAE --data $BASE_DATA \
    --out runs/distill_base --mode consistency --steps 6000 \
    --batch 2 --remat --scan-steps 8 --log-every 200 --save-every 1000 \
    >> runs/distill_base/run.log 2>&1'

stage student_quality_base runs/distill_base/student_quality.json '
  DISTILL_RUN=runs/distill_base RUN=$FT_RUN DATA=$PA_DATA \
      PRESET=prompt_adherence_text BATCH=2 STUDENT_STEPS=2,4,8 \
    timeout 7200 python tools/student_quality.py \
    > runs/distill_base/student_quality.json.tmp 2> runs/distill_base/student_quality.log \
  && [ -s runs/distill_base/student_quality.json.tmp ] \
  && mv runs/distill_base/student_quality.json.tmp runs/distill_base/student_quality.json'

echo "=== chain r5 complete $(date -u +%H:%M:%S)"
