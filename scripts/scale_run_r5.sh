#!/bin/bash
# Round-5 scale validation runbook: the full reference pipeline
# (script.sh:1-63) on a 500-scene synthetic world with dense
# multi-object scenes, through the PUBLIC CLIs, on the real chip.
#
# Differences from the round-4 runbook (scale_run_r4.sh):
#   * SELF-CONTAINED (VERDICT r4 missing #4): step_world generates the
#     world + training JSON, and step_stage1/step_existence launch the
#     trainers themselves (supervised, --max_restarts) — no out-of-repo
#     watchers; scale_chain_r5.sh runs every step in order.
#   * T() stamps @epoch-seconds (ADVICE r4) so scale_report.py's
#     wall-clocks are exact across any number of midnights.
#   * Discovery runs at --max_active ${MAX_ACTIVE:-1536}: the r4 dense
#     segments overflowed the default-1024 boundary lattice by 575-963
#     boxes/group (demand ~4.7-5k per 4-image group); 1536/image covers
#     the measured demand, and the engine now sheds score-ranked if a
#     heavier world ever overflows anyway.
#   * step_max_active_ab quantifies the 1024-lattice truncation on the
#     dense tail (VERDICT r4 missing #2) against the main run's output.
#   * MAX_SPLITS defaults to 3072: the r5 500-scene run measured split
#     demand up to ~8.9k per 4-image group on SPARSE scenes (11/25
#     sparse groups overflowed the 2048/image lattice by 7.5k total —
#     sparse scenes fail the singularity check more often); 3072/image
#     (12,288 slots/group) covers it, and split shedding is now
#     score-ranked (weakest-existence parents first) if a heavier world
#     overflows anyway.
#
# Every stage appends wall-clock + key counters to
# $WORK/scale_timings.txt; discovery logs feed
# scripts/parse_discovery_stats.py for the STATUS table.
set -euo pipefail

REPO=${REPO:-/root/repo}
SYNTH=${SYNTH:-/tmp/synth500}
WORK=${WORK:-/root/scale_r5}
# world + schedule knobs (overridable so the slow-lane smoke test can
# drive the identical script on a tiny world)
SCENES=${SCENES:-500}
SIZE=${SIZE:-480}            # scene image size (world generation)
STAGE1_N=${STAGE1_N:-1200}
DENSE_FRAC=${DENSE_FRAC:-0.2}
DENSE_OBJECTS=${DENSE_OBJECTS:-50}
S1_ITERS=${S1_ITERS:-5000}
EXIST_ITERS=${EXIST_ITERS:-500}
CAD_ITERS=${CAD_ITERS:-2500}
CAD_STEP=${CAD_STEP:-1500}
CAD_BATCH=${CAD_BATCH:-8}
# durable mid-run checkpoints: the config default period (1000) exceeds
# short runs' MAX_ITER, so a kill in the final (PreciseBN + cold eval
# compile, silently many minutes) phase lost ALL training — the restart
# re-trained from iter 0 (r5 post-mortem). Also give the busy-wedge
# watchdog headroom above the cold-compile cost of that phase.
CAD_CKPT_PERIOD=${CAD_CKPT_PERIOD:-300}
CAD_BUSY_TIMEOUT_MIN=${CAD_BUSY_TIMEOUT_MIN:-35}
MAX_ACTIVE=${MAX_ACTIVE:-1536}
# Bound each boundary-evolution XLA execution: at max_active 1536 a
# dense 4-image group's FUSED 50-round evolution runs long enough to
# trip the axon relay's execution watchdog ("TPU worker process
# crashed or restarted" — exactly how the first r5 discovery attempt
# died). 10-round segments are bit-identical and keep every execution
# well under the kill threshold; the host sync per segment costs ~34ms
# against ~100s+ of segment compute.
BOUNDARY_SEG=${BOUNDARY_SEG:-10}
SEG=${SEG:-100}              # discovery scenes per fresh process
# Discovery self-supervision: a relay reconnect mid-run leaves the
# client blocked forever inside a device op at ~0% CPU (r5 incident:
# 30+ min silent after [92/100] with fresh axon-conn threads — the
# in-flight execution was lost in the reconnect). The supervisor
# kills on output silence and relaunches; the per-group partial
# results make the restart lose at most one image group. The hang
# timeout must exceed the longest legitimate silence — a cold-cache
# remote compile (~15-35 min) — so first runs aren't killed mid-compile.
DISC_RESTARTS=${DISC_RESTARTS:-3}
DISC_HANG_MIN=${DISC_HANG_MIN:-45}
DISC_BUSY_HANG_MIN=${DISC_BUSY_HANG_MIN:-15}
# Scoring hang timeout is separate: on a host where discovery already
# ran, discovery restarts are warm-cache (tight timeouts are safe) but
# scoring's first run still pays its own cold remote compile.
SCORE_HANG_MIN=${SCORE_HANG_MIN:-$DISC_HANG_MIN}
# Discovery upper bound, defaulting to the whole world. Lets a
# wall-clock-bounded run cover a prefix (dense ids 1-100 first) while
# the world itself stays full-size for GT/eval.
DISC_SCENES=${DISC_SCENES:-$SCENES}
AB_END=${AB_END:-40}         # dense-tail A/B subset [0, AB_END)
CANVAS=${CANVAS:-512}
IMAGE_BATCH=${IMAGE_BATCH:-4}
RUN=${RUN:-disc_r5}
# smoke-test knobs (tests/test_scale_chain.py drives the identical
# script on a tiny CPU world; production defaults otherwise)
BACKBONE=${BACKBONE:-dpt_large}
S1_BATCH=${S1_BATCH:-20}
EXIST_BATCH=${EXIST_BATCH:-20}
SAVE_EVERY=${SAVE_EVERY:-1000}
EXIST_SAVE=${EXIST_SAVE:-250}
N_ROUND=${N_ROUND:-50}
MAX_PROPOSALS=${MAX_PROPOSALS:-2048}
MAX_SPLITS=${MAX_SPLITS:-3072}
CAD_CONFIG=${CAD_CONFIG:-$REPO/cad/configs/cascade_mask_rcnn_R_50_FPN.yaml}
CAD_CANVAS=${CAD_CANVAS:-}   # empty = config default; smoke passes 64
CAD_EVAL_PERIOD=${CAD_EVAL_PERIOD:-1000}
CAD_OUT=${CAD_OUT:-$WORK/cad_r5}  # override for a second CAD leg (e.g. full-world merge)

# trainers run from $WORK, so every artifact (checkpoints included)
# lands under the work dir — nothing writes into the repo tree
OBJ_CKPT=$WORK/results_objectness/center_and_boundary/s1_r5/ckpt/iter_${S1_ITERS}_model.ckpt
CLS_CKPT=$WORK/results_objectness/existence/exist_r5/ckpt/iter_${EXIST_ITERS}_model.ckpt
mkdir -p "$WORK"
cd "$WORK"
T() { echo "$(date -u +%H:%M:%S) @$(date -u +%s) $*" >> "$WORK/scale_timings.txt"; }

# Latest durable periodic checkpoint in a run's ckpt dir (ignores
# in-flight .tmp drains). Lets an interrupted chain relaunch resume a
# trainer mid-run instead of re-training from iter 0 — the supervisor
# inside the trainer only covers crashes of ITS child, not an external
# kill of the whole process tree (host rebuild, session restart).
latest_ckpt() { # dir; prints nothing when no durable ckpt exists yet.
  # `|| true` guards pipefail: with no match ls exits 2, and under the
  # script's `set -euo pipefail` that killed the whole step before it
  # logged anything (exactly how the 02:04 chain relaunch lost every
  # stage after stage1). sort -V orders by the embedded iteration
  # number (plain sort puts iter_10000 before iter_2000).
  { ls "$1"/iter_*_model.ckpt 2>/dev/null || true; } | sort -V | tail -1
}

# ---- step 0: world generation + native lib (idempotent) -------------
step_world() {
  T "world start"
  if [ ! -f "$SYNTH/coco/instances.json" ]; then
    python -u "$REPO/scripts/make_synthetic_shapes.py" --out "$SYNTH" \
      --stage1_n "$STAGE1_N" --scenes "$SCENES" --size "$SIZE" \
      --dense_frac "$DENSE_FRAC" --dense_objects "$DENSE_OBJECTS"
  fi
  if [ ! -f "$SYNTH/imagenet_training.json" ]; then
    python -u "$REPO/scripts/make_imagenet_training_json.py" \
      --synth "$SYNTH" --out "$SYNTH/imagenet_training.json"
  fi
  (cd "$REPO" && python -c "from unmore_tpu import native; assert native.build()")
  T "world done"
}

# ---- step 1a: stage-1 objectness (reference README.md:150-163 flags,
# 500k-iter recipe at the synthetic scale) ----------------------------
step_stage1() {
  if [ -f "$OBJ_CKPT" ]; then T "stage1 already complete"; return 0; fi
  local resume_args=() last
  last=$(latest_ckpt "$(dirname "$OBJ_CKPT")")
  [ -n "$last" ] && resume_args=(--resume "$last")
  # resume noted on its own line: scale_report.py pairs "<stage> start"
  # with "<stage> done" by exact suffix, and a restamped start correctly
  # scopes the wall-clock to the resumed leg
  [ -n "$last" ] && T "stage1 resume from $last"
  T "stage1 start"
  (cd "$WORK" && python -u "$REPO/train_objectness_net.py" --train_center_and_boundary \
    "${resume_args[@]}" \
    --dataset ImageNet_votecut_top1_Dataset --backbone_type "$BACKBONE" \
    --optimizer adam --learning_rate 1e-4 --lr_scheduler_gamma 0.1 \
    --batch_size "$S1_BATCH" --sdf_loss_type l1 --center_field_loss_type l2 \
    --use_sdf_binary_mask_loss --use_sdf_gradient_loss --use_bg_sdf \
    --imagenet_dir "$SYNTH/imagenet" --votecut_mask_dir "$SYNTH/masks" \
    --train_iter "$S1_ITERS" --save_ckpt_every "$SAVE_EVERY" --visualize_every 100000 \
    --num_workers 2 --run_name s1_r5 --max_restarts 3 --spike_guard_warmup 1000)
  T "stage1 done"
}

# ---- step 1b: existence classifier ---------------------------------
step_existence() {
  if [ -f "$CLS_CKPT" ]; then T "existence already complete"; return 0; fi
  local resume_args=() last
  last=$(latest_ckpt "$(dirname "$CLS_CKPT")")
  [ -n "$last" ] && resume_args=(--resume "$last")
  [ -n "$last" ] && T "existence resume from $last"
  T "existence start"
  (cd "$WORK" && python -u "$REPO/train_objectness_net.py" --train_existence \
    "${resume_args[@]}" \
    --dataset ImageNet_votecut_labeled_classifier_Dataset \
    --imagenet_dir "$SYNTH/imagenet" --votecut_mask_dir "$SYNTH/masks" \
    --batch_size "$EXIST_BATCH" --learning_rate 1e-4 --train_iter "$EXIST_ITERS" \
    --save_ckpt_every "$EXIST_SAVE" --num_workers 2 --run_name exist_r5 --max_restarts 3)
  T "existence done"
}

# ---- step 2: discovery over all scenes, segmented into fresh
# processes (the reference's --start_idx/--end_idx job model,
# datasets.py:432-435) ------------------------------------------------
step_discovery() {
  # DISC_START resumes/extends a partially-discovered world without
  # re-running earlier segments (their per-segment result dirs are
  # still picked up by the merge below)
  local s=${DISC_START:-0} e
  while [ "$s" -lt "$DISC_SCENES" ]; do
    e=$((s + SEG)); [ "$e" -gt "$DISC_SCENES" ] && e=$DISC_SCENES
    if [ -f "$WORK/results_reasoning/${RUN}_${s}_${e}/discovery_results.json" ]; then
      T "discovery seg $s-$e already complete"; s=$e; continue
    fi
    T "discovery seg $s-$e start"
    # a partially-discovered segment (partial-results file present)
    # means this is a relaunch: APPEND to the segment log so earlier
    # attempts' per-image stats lines survive for the stats aggregate
    local tee_flags=()
    [ -f "$WORK/results_reasoning/${RUN}_${s}_${e}/partial_results_p0.jsonl" ] && tee_flags=(-a)
    python -u "$REPO/object_reasoning.py" \
      --backbone_type "$BACKBONE" --use_bg_sdf --analyze_cc \
      --objectness_resume "$OBJ_CKPT" --binary_classifier_resume "$CLS_CKPT" \
      --coco_image_dir "$SYNTH/coco/images" --coco_annotations "$SYNTH/coco/instances.json" \
      --run_name "$RUN" --image_batch "$IMAGE_BATCH" --canvas_size "$CANVAS" \
      --max_active "$MAX_ACTIVE" --max_proposals "$MAX_PROPOSALS" \
      --max_splits "$MAX_SPLITS" --n_round "$N_ROUND" \
      --boundary_segment "$BOUNDARY_SEG" \
      --max_restarts "$DISC_RESTARTS" --hang_timeout_min "$DISC_HANG_MIN" \
      --busy_hang_timeout_min "$DISC_BUSY_HANG_MIN" \
      --start_idx "$s" --end_idx "$e" 2>&1 | tee "${tee_flags[@]}" "${RUN}_${s}_${e}.log"
    T "discovery seg $s-$e done"
    s=$e
  done
  python - "$RUN" <<'EOF'
import json, glob, os, sys
run = sys.argv[1]
merged = {}
for p in sorted(glob.glob(f"results_reasoning/{run}_*_*/discovery_results.json")):
    with open(p) as f:
        merged.update(json.load(f))
os.makedirs(f"results_reasoning/{run}", exist_ok=True)
with open(f"results_reasoning/{run}/discovery_results.json", "w") as f:
    json.dump(merged, f)
print("merged", len(merged), "images")
EOF
  # also feed the chain's append-only step log: per-segment logs are
  # truncated on fresh launches, but step_discovery.log accumulates
  # every attempt, so per-image stats survive relaunches (the parser
  # dedups by image id, last attempt wins)
  local extra_logs=()
  [ -f "$WORK/step_discovery.log" ] && extra_logs=("$WORK/step_discovery.log")
  python "$REPO/scripts/parse_discovery_stats.py" "${RUN}"_*.log \
    "${extra_logs[@]}" --dense_upto 100 --out "$WORK/discovery_stats_r5.json"
}

# ---- step 3: scoring (batched sharded engine) -----------------------
step_scoring() {
  T "scoring start"
  # same append-on-relaunch policy as discovery (see step_discovery)
  local tee_flags=()
  [ -f "$WORK/results_reasoning/$RUN/scoring_partial_p0.jsonl" ] && tee_flags=(-a)
  python -u "$REPO/object_scoring.py" \
    --backbone_type "$BACKBONE" --use_bg_sdf \
    --objectness_resume "$OBJ_CKPT" --binary_classifier_resume "$CLS_CKPT" \
    --coco_image_dir "$SYNTH/coco/images" --coco_annotations "$SYNTH/coco/instances.json" \
    --raw_annotations_path "results_reasoning/$RUN/discovery_results.json" \
    --image_batch "$IMAGE_BATCH" --canvas_size "$CANVAS" \
    --max_restarts "$DISC_RESTARTS" --hang_timeout_min "$SCORE_HANG_MIN" \
    --busy_hang_timeout_min "$DISC_BUSY_HANG_MIN" 2>&1 | tee "${tee_flags[@]}" scoring_r5.log
  T "scoring done"
}

# ---- step 4+5: post-process filter + evaluate the pseudo-labels -----
step_post_eval() {
  T "post start"
  python -u "$REPO/post_process.py" \
    --pred_annotations_path "results_reasoning/$RUN/object_discovery_with_scores.json" \
    --gt_annotation_path "$SYNTH/coco/instances.json"
  # Evaluate against the GT subset of DISCOVERED images only: when
  # DISC_SCENES < SCENES the predictions cover a prefix of the world,
  # and scoring recall against the full GT would silently deflate AP
  # by counting every never-discovered scene as pure miss.
  python - "$REPO" "$SYNTH" "$DISC_SCENES" \
    "$WORK/gt_discovered_subset.json" <<'EOF'
import json, os, sys
repo, synth, disc_scenes, out_path = sys.argv[1:5]
sys.path.insert(0, repo)
from unmore_tpu.data.coco import COCOImages
# the exact index slice the discovery CLI processed (zero-box images
# included, so their GT still counts as missed recall)
gt_path = os.path.join(synth, "coco", "instances.json")
ds = COCOImages(os.path.join(synth, "coco", "images"), gt_path, 0, int(disc_scenes))
covered = {int(ds.image_id(i)) for i in range(len(ds))}
with open(gt_path) as f:
    gt = json.load(f)
gt["images"] = [im for im in gt["images"] if im["id"] in covered]
gt["annotations"] = [a for a in gt["annotations"] if a["image_id"] in covered]
with open(out_path, "w") as f:
    json.dump(gt, f)
print(f"eval GT subset: {len(gt['images'])} images, {len(gt['annotations'])} anns")
EOF
  python -u "$REPO/COCO_evaluator/main.py" \
    --gt_annotations_path "$WORK/gt_discovered_subset.json" \
    --pred_annotations_path "results_reasoning/$RUN/object_discovery_with_scores.json" \
    --tasks bbox segm \
    --out_path "$WORK/ap_score_pseudo.json" 2>&1 | tee coco_eval_r5.log
  T "post+eval done"
}

# ---- step 6: merge with the ImageNet (single-object) json -----------
step_merge() {
  python -u "$REPO/merge_coco_and_imagenet.py" \
    --coco_annotations_training_format_path "results_reasoning/$RUN/selected_training_annotations.json" \
    --imagenet_annotations_training_format_path "$SYNTH/imagenet_training.json"
}

# ---- step 7: CAD crossing an LR milestone, in-train eval +
# PreciseBN, AP-verified eval at the end -------------------------------
step_cad() {
  T "cad start"
  MERGED=$WORK/results_reasoning/$RUN/merged_with_imagenet/COCO_merged_IN_training_format.json
  local canvas_args=()
  [ -n "$CAD_CANVAS" ] && canvas_args=(--canvas-size "$CAD_CANVAS")
  python -u "$REPO/cad/train_net.py" \
    --config-file "$CAD_CONFIG" "${canvas_args[@]}" \
    --train-json "$MERGED" \
    --image-root "coco=$SYNTH/coco/images" \
    --image-root "imagenet=$SYNTH/imagenet" \
    --test-json "$SYNTH/coco/instances.json" \
    --test-image-dir "$SYNTH/coco/images" \
    --train-workers 4 --max-restarts 3 \
    --busy-hang-timeout-min "$CAD_BUSY_TIMEOUT_MIN" \
    SOLVER.MAX_ITER "$CAD_ITERS" SOLVER.STEPS "[$CAD_STEP]" \
    SOLVER.CHECKPOINT_PERIOD "$CAD_CKPT_PERIOD" \
    SOLVER.IMS_PER_BATCH "$CAD_BATCH" \
    TEST.EVAL_PERIOD "$CAD_EVAL_PERIOD" \
    OUTPUT_DIR "$CAD_OUT" 2>&1 | tee "$CAD_OUT.log"
  T "cad done"
}

# ---- step 8: boundary-lattice truncation A/B on the dense tail
# (VERDICT r4 missing #2): dense scenes at max_active 1024 (the old
# default) vs the main run's $MAX_ACTIVE output, same scorer, same
# subset GT ------------------------------------------------------------
step_max_active_ab() {
  T "max_active_ab start"
  python -u "$REPO/scripts/max_active_ab.py" --synth "$SYNTH" \
    --backbone_type "$BACKBONE" \
    --objectness "$OBJ_CKPT" --classifier "$CLS_CKPT" \
    --main_scored "$WORK/results_reasoning/$RUN/object_discovery_with_scores.json" \
    --main_max_active "$MAX_ACTIVE" --max_active 1024 \
    --canvas_size "$CANVAS" --image_batch "$IMAGE_BATCH" \
    --start_idx 0 --end_idx "$AB_END" \
    --out "$REPO/scripts/max_active_ab_results.json" \
    2>&1 | tee "$WORK/max_active_ab_r5.log"
  T "max_active_ab done"
}

# ---- step 9: sticky-convergence A/B on the dense tail (the packed
# regime the r3 24-sparse-scene A/B never sampled; VERDICT r4 weak #2).
# The reference leg runs ~3.2x the sticky leg ------------------------
step_sticky_ab() {
  T "sticky_ab start"
  python -u "$REPO/scripts/sticky_ab.py" --synth "$SYNTH" \
    --backbone_type "$BACKBONE" \
    --objectness "$OBJ_CKPT" --classifier "$CLS_CKPT" \
    --canvas_size "$CANVAS" --image_batch "$IMAGE_BATCH" \
    --start_idx 0 --end_idx "$AB_END" \
    2>&1 | tee "$WORK/sticky_ab_r5.log"
  T "sticky_ab done"
}

"$@"
