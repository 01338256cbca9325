#!/bin/bash
# Round-4 chip chain — idempotent by construction (VERDICT r3 #9): every stage checks for
# its completion artifact and is skipped when present, training/distill stages resume from
# their own checkpoints, and JSON-producing stages write to a tmp file moved into place
# only on success. A container reset is recovered by simply relaunching this script.
#
# Stage order = value per chip-hour (VERDICT r3 "Next round" ranking):
#   1. adherence eval on the EXISTING phase-1 checkpoint   (r3 #1 — before any training)
#   2. MFU accounting                                      (r3 #5 — short, independent)
#   3. phase-2 maskloss training, resume 5k -> 16k         (r3 #2; image-val now wired)
#   4. adherence eval on the phase-2 checkpoint            (r3 #2 "re-run the eval")
#   5. approximation-ladder fidelity on the trained ckpt   (r3 #4; RUN= via _distill_common)
#   6. consistency distillation FROM the trained ckpt      (r3 #3; resumable save-every 1k)
#   7. student quality vs its real teacher                 (r3 #3 quality table)
cd /root/repo || exit 1
export VAE=runs/vae_pretrain/vae_final_fp16.npz
# Eval uses the ORIGINAL 320-pair set's test split for both phases (same held-out tiles →
# phase-1 vs phase-2 numbers are directly comparable); phase-2 training and distillation
# use the 10x regenerated set when present (VERDICT r3 weak #4: 260 train tiles is
# under-powered; synthetic data is cheap).
export PA_DATA=data/synth_pa/pairs.jsonl
# Always the regenerated 10x set: the make_data_pa2 stage below guarantees it exists
# before any consumer runs (an existence fallback here resolved BEFORE the stages ran
# and silently downgraded phase 2 to the 320-pair set).
export PA_TRAIN_DATA=data/synth_pa2/pairs.jsonl
export PA_RUN=runs/prompt_adherence

stage() { # stage NAME ARTIFACT CMD-STRING   (CMD runs under bash -c; skipped if ARTIFACT exists)
  local name=$1 artifact=$2 cmd=$3
  # A container reset can leave a 0-byte husk where an artifact was mid-write: treat
  # empty files as absent (and remove them so `>>` log appends start clean).
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

mkdir -p "$PA_RUN/eval_phase1" "$PA_RUN/eval_phase2" runs/distill_pa

# 0. datasets — untracked, wiped by container resets; regeneration is seed-deterministic
#    (generate_pair(seed + i): synth_pa = tile seeds 0..31, so its held-out eval split
#    reproduces bit-identically across relaunches). synth_pa2 uses seed 1000 so its 128
#    training tiles are DISJOINT from the eval set's seed range (no test leakage).
stage make_data_pa data/synth_pa/pairs.jsonl '
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 3600 \
    python -m topomap_tpu.cli.main make-data --out data/synth_pa --tiles 32 --seed 0'

stage make_data_pa2 data/synth_pa2/pairs.jsonl '
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 7200 \
    python -m topomap_tpu.cli.main make-data --out data/synth_pa2 --tiles 128 --seed 1000'

# 1. image-level adherence proof on the checkpoint we already have (phase-1, step 5000)
stage adherence_eval_p1 "$PA_RUN/eval_phase1/adherence_report.json" '
  RUN=$PA_RUN DATA=$PA_DATA PER_PROMPT=4 STEPS=20 OUT=$PA_RUN/eval_phase1 \
    timeout 7200 python tools/prompt_adherence_eval.py \
    > $PA_RUN/eval_phase1/eval.log 2>&1'

# 2. MFU accounting (exact-path TFLOP/s vs same-session GEMM ceiling)
stage mfu_accounting "$PA_RUN/mfu_accounting.json" '
  timeout 5400 python tools/mfu_accounting.py \
    > $PA_RUN/mfu_accounting.json.tmp 2> $PA_RUN/mfu_accounting.log \
  && [ -s $PA_RUN/mfu_accounting.json.tmp ] \
  && mv $PA_RUN/mfu_accounting.json.tmp $PA_RUN/mfu_accounting.json'

# 3. phase-2 maskloss training (resumes from the newest ckpt in $PA_RUN/ckpt; maskloss
#    switches on past the preset's 6k warmup). Log appends across relaunches. Batch 2
#    first; on failure (the batch-2 maskloss step OOM'd pre-remat-decode at 18.85G)
#    retry at the reference's own batch 1 (addlrSD.py:385).
stage phase2_maskloss "$PA_RUN/ckpt/16000" '
  python -m topomap_tpu.cli.main train --preset prompt_adherence \
    --data $PA_TRAIN_DATA --out $PA_RUN \
    --vae-ckpt $VAE --steps 16000 --batch 2 --remat --scan-steps 8 \
    --log-every 200 --prefetch 2 \
    >> $PA_RUN/phase2.log 2>&1 \
  || python -m topomap_tpu.cli.main train --preset prompt_adherence \
    --data $PA_TRAIN_DATA --out $PA_RUN \
    --vae-ckpt $VAE --steps 16000 --batch 1 --remat --scan-steps 8 \
    --log-every 200 --prefetch 2 \
    >> $PA_RUN/phase2.log 2>&1'

# 4. adherence eval on the phase-2 (maskloss-trained) checkpoint
stage adherence_eval_p2 "$PA_RUN/eval_phase2/adherence_report.json" '
  [ -e $PA_RUN/ckpt/16000 ] || exit 3   # only meaningful after phase 2 finished
  RUN=$PA_RUN DATA=$PA_DATA PER_PROMPT=4 STEPS=20 OUT=$PA_RUN/eval_phase2 \
    timeout 7200 python tools/prompt_adherence_eval.py \
    > $PA_RUN/eval_phase2/eval.log 2>&1'

# 5. approximation ladder on the trained checkpoint (init_base RUN= restore)
stage approx_quality_trained "$PA_RUN/approx_quality.json" '
  RUN=$PA_RUN PRESET=prompt_adherence DATA=$PA_DATA BATCH=2 \
    timeout 5400 python tools/approx_quality.py \
    > $PA_RUN/approx_quality.json.tmp 2> $PA_RUN/approx_quality.log \
  && [ -s $PA_RUN/approx_quality.json.tmp ] \
  && mv $PA_RUN/approx_quality.json.tmp $PA_RUN/approx_quality.json'

# 6. consistency distillation FROM the trained checkpoint (resumable: cmd_distill picks
#    up the newest unet_lora_step*.npz in --out after a reset)
stage distill_pa runs/distill_pa/unet_lora_step10000.npz '
  timeout 18000 python -m topomap_tpu.cli.main distill --preset prompt_adherence \
    --ckpt $PA_RUN --vae-ckpt $VAE --data $PA_TRAIN_DATA \
    --out runs/distill_pa --mode consistency --steps 10000 \
    --batch 2 --remat --scan-steps 8 --log-every 200 --save-every 1000 \
    >> runs/distill_pa/run.log 2>&1'

# 7. student quality vs its own (trained) teacher — the 8 t/s quality column
stage student_quality runs/distill_pa/student_quality.json '
  DISTILL_RUN=runs/distill_pa RUN=$PA_RUN DATA=$PA_DATA \
      PRESET=prompt_adherence BATCH=2 STUDENT_STEPS=2,4,8 \
    timeout 7200 python tools/student_quality.py \
    > runs/distill_pa/student_quality.json.tmp 2> runs/distill_pa/student_quality.log \
  && [ -s runs/distill_pa/student_quality.json.tmp ] \
  && mv runs/distill_pa/student_quality.json.tmp runs/distill_pa/student_quality.json'

echo "=== chain r4 complete $(date -u +%H:%M:%S)"
