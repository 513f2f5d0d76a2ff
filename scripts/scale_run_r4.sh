#!/bin/bash
# Round-4 scale validation (VERDICT r3 "Next round" item 1): the full
# 7-step reference pipeline (script.sh:1-63) on a 500-scene synthetic
# world with dense multi-object scenes, through the PUBLIC CLIs, on the
# real chip. Every stage appends wall-clock + key counters to
# $WORK/scale_timings.txt; the discovery logs feed
# scripts/parse_discovery_stats.py for the STATUS table (img/s,
# lattice overflow counters, boundary-round distribution).
#
# This file is the runbook of record for the numbers in STATUS.md
# ("Round-4 scale validation") — stages were driven one at a time and
# watched; run it end-to-end only on a host with a warm compile cache.
set -euo pipefail

REPO=/root/repo
SYNTH=/tmp/synth500          # scripts/make_synthetic_shapes.py --out /tmp/synth500 \
                             #   --stage1_n 1200 --scenes 500 --dense_frac 0.2 --dense_objects 50
                             # (+ scripts/make_imagenet_training_json.py --synth /tmp/synth500
                             #    --out /tmp/synth500/imagenet_training.json for the merge step)
                             # dense scenes are image ids 1..100 (scene index < n*dense_frac)
WORK=${WORK:-/root/scale_r4} # results_reasoning/ etc. live here, outside the repo
OBJ_CKPT=$REPO/results_objectness/center_and_boundary/s1_r4/ckpt/iter_5000_model.ckpt
CLS_CKPT=$REPO/results_objectness/existence/exist_r4/ckpt/iter_500_model.ckpt
mkdir -p "$WORK"
cd "$WORK"
T() { echo "$(date -u +%H:%M:%S) $*" >> "$WORK/scale_timings.txt"; }

# ---- step 1a: stage-1 objectness (5000 iters, ~500k-iter reference
# recipe at the synthetic scale; README.md:150-163 flags) ------------
# python -u $REPO/train_objectness_net.py --train_center_and_boundary \
#   --dataset ImageNet_votecut_top1_Dataset --backbone_type dpt_large \
#   --optimizer adam --learning_rate 1e-4 --lr_scheduler_gamma 0.1 \
#   --batch_size 20 --sdf_loss_type l1 --center_field_loss_type l2 \
#   --use_sdf_binary_mask_loss --use_sdf_gradient_loss --use_bg_sdf \
#   --imagenet_dir $SYNTH/imagenet --votecut_mask_dir $SYNTH/masks \
#   --train_iter 5000 --save_ckpt_every 1000 --visualize_every 2500 \
#   --num_workers 2 --run_name s1_r4 --max_restarts 3 --spike_guard_warmup 1000

# ---- step 1b: existence classifier (500 iters) ---------------------
step_existence() {
  T "existence start"
  (cd "$REPO" && python -u train_objectness_net.py --train_existence \
    --dataset ImageNet_votecut_labeled_classifier_Dataset \
    --imagenet_dir "$SYNTH/imagenet" --votecut_mask_dir "$SYNTH/masks" \
    --batch_size 20 --learning_rate 1e-4 --train_iter 500 \
    --save_ckpt_every 250 --num_workers 2 --run_name exist_r4 --max_restarts 3)
  T "existence done"
}

# ---- step 2: discovery over all 500 scenes, segmented into fresh
# processes of 100 (the reference's own --start_idx/--end_idx job
# model, datasets.py:432-435; bounds process memory and lets a crashed
# segment retry alone) -----------------------------------------------
step_discovery() {
  for s in 0 100 200 300 400; do
    e=$((s + 100))
    T "discovery seg $s-$e start"
    python -u "$REPO/object_reasoning.py" \
      --backbone_type dpt_large --use_bg_sdf --analyze_cc \
      --objectness_resume "$OBJ_CKPT" --binary_classifier_resume "$CLS_CKPT" \
      --coco_image_dir "$SYNTH/coco/images" --coco_annotations "$SYNTH/coco/instances.json" \
      --run_name disc_r4 --image_batch 4 --canvas_size 512 \
      --start_idx "$s" --end_idx "$e" 2>&1 | tee "disc_r4_${s}_${e}.log"
    T "discovery seg $s-$e done"
  done
  python - <<'EOF'
import json, glob
merged = {}
for p in sorted(glob.glob("results_reasoning/disc_r4_*_*/discovery_results.json")):
    with open(p) as f:
        merged.update(json.load(f))
import os
os.makedirs("results_reasoning/disc_r4", exist_ok=True)
with open("results_reasoning/disc_r4/discovery_results.json", "w") as f:
    json.dump(merged, f)
print("merged", len(merged), "images")
EOF
  python "$REPO/scripts/parse_discovery_stats.py" disc_r4_*.log \
    --dense_upto 100 --out "$WORK/discovery_stats_r4.json"
}

# ---- step 3: scoring (batched sharded engine; paste-back fraction
# comes from its stage timers) ---------------------------------------
step_scoring() {
  T "scoring start"
  python -u "$REPO/object_scoring.py" \
    --backbone_type dpt_large --use_bg_sdf \
    --objectness_resume "$OBJ_CKPT" --binary_classifier_resume "$CLS_CKPT" \
    --coco_image_dir "$SYNTH/coco/images" --coco_annotations "$SYNTH/coco/instances.json" \
    --raw_annotations_path results_reasoning/disc_r4/discovery_results.json \
    --image_batch 4 --canvas_size 512 2>&1 | tee scoring_r4.log
  T "scoring done"
}

# ---- step 4+5: post-process filter + evaluate the pseudo-labels ----
step_post_eval() {
  T "post start"
  python -u "$REPO/post_process.py" \
    --pred_annotations_path results_reasoning/disc_r4/object_discovery_with_scores.json \
    --gt_annotation_path "$SYNTH/coco/instances.json"
  python -u "$REPO/COCO_evaluator/main.py" \
    --gt_annotations_path "$SYNTH/coco/instances.json" \
    --pred_annotations_path results_reasoning/disc_r4/object_discovery_with_scores.json \
    --tasks bbox segm \
    --out_path "$WORK/ap_score_pseudo.json" 2>&1 | tee coco_eval_r4.log
  T "post+eval done"
}

# ---- step 6: merge with the ImageNet (single-object) json ----------
step_merge() {
  python -u "$REPO/merge_coco_and_imagenet.py" \
    --coco_annotations_training_format_path results_reasoning/disc_r4/selected_training_annotations.json \
    --imagenet_annotations_training_format_path "$SYNTH/imagenet_training.json"
  # -> results_reasoning/disc_r4/merged_with_imagenet/COCO_merged_IN_training_format.json
}

# ---- step 7: CAD 2500 iters crossing an LR milestone, in-train eval
# + PreciseBN, AP-verified eval at the end ---------------------------
step_cad() {
  T "cad start"
  MERGED=$WORK/results_reasoning/disc_r4/merged_with_imagenet/COCO_merged_IN_training_format.json
  python -u "$REPO/cad/train_net.py" \
    --config-file "$REPO/cad/configs/cascade_mask_rcnn_R_50_FPN.yaml" \
    --train-json "$MERGED" \
    --image-root "coco=$SYNTH/coco/images" \
    --image-root "imagenet=$SYNTH/imagenet" \
    --test-json "$SYNTH/coco/instances.json" \
    --test-image-dir "$SYNTH/coco/images" \
    --train-workers 4 --max-restarts 3 \
    SOLVER.MAX_ITER 2500 SOLVER.STEPS "[1500]" SOLVER.IMS_PER_BATCH 8 \
    TEST.EVAL_PERIOD 1000 OUTPUT_DIR "$WORK/cad_r4" 2>&1 | tee "$WORK/cad_r4.log"
  T "cad done"
}

# ---- step 8: sticky-convergence A/B on the dense tail (scenes 0-40,
# ~1,700 annotations — the packed regime round 3's 24 sparse scenes
# never sampled; the r3 sparse A/B stands as the other data point).
# Sized to the wall clock: the reference leg runs ~3.2x the sticky
# leg, and dense scenes are ~3x sparse ones, so 40 dense scenes
# already cost ~2.5h for both legs -------------------------------
step_sticky_ab() {
  T "sticky_ab start"
  python -u "$REPO/scripts/sticky_ab.py" --synth "$SYNTH" \
    --objectness "$OBJ_CKPT" --classifier "$CLS_CKPT" \
    --canvas_size 512 --image_batch 4 --start_idx 0 --end_idx 40 \
    2>&1 | tee "$WORK/sticky_ab_r4.log"
  T "sticky_ab done"
}

"$@"
