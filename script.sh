#!/usr/bin/env bash
# End-to-end unMORE recipe on TPU — the counterpart of the reference's
# canonical /root/reference/script.sh (same 7 steps, same artifacts).
# All stages run on whatever jax.devices() exposes; multi-chip hosts
# shard automatically over a data-parallel mesh (no CUDA_VISIBLE_DEVICES
# equivalent is needed — use JAX_PLATFORMS / standard JAX device env).
#
# Paths to fill in:
#   $IMAGENET_DIR         ImageNet train images
#   $VOTECUT_MASK_DIR     top-1 VoteCut mask PNGs (utils/preprocess_votecut.py)
#   $COCO_IMG / $COCO_ANN COCO train2017 images + instances json
#   $DATA_ROOT            root holding the eval datasets (COCO*, LVIS, ...)
set -euo pipefail

### 1. Train Objectness Net
#### 1.1 Object Center and Boundary model (reference script.sh:3-7)
# batch 20 mirrors the reference GPU config; on a v5e chip batch 64 is
# the measured sweet spot (180 imgs/s step-time at MFU 0.72 vs 150 at
# batch 20 — scripts/stage1_train_results.json)
python train_objectness_net.py --dataset ImageNet_votecut_top1_Dataset \
    --backbone_type dpt_large --optimizer adam --lr_scheduler_gamma 0.1 --learning_rate 0.0001 \
    --batch_size 20 \
    --sdf_loss_type l1 --center_field_loss_type l2 --use_sdf_binary_mask_loss --use_sdf_gradient_loss \
    --sdf_activation tanh --use_bg_sdf \
    --imagenet_dir "$IMAGENET_DIR" --votecut_mask_dir "$VOTECUT_MASK_DIR" \
    --train_center_and_boundary

#### 1.2 Object Existence model (reference script.sh:9-14)
python train_objectness_net.py --dataset ImageNet_votecut_top1_Dataset \
    --backbone_type dpt_large --optimizer adam --lr_scheduler_gamma 0.1 --learning_rate 0.0001 \
    --batch_size 20 \
    --sdf_activation tanh --use_bg_sdf \
    --imagenet_dir "$IMAGENET_DIR" --votecut_mask_dir "$VOTECUT_MASK_DIR" \
    --train_existence

### 2. Object Discovery (reference script.sh:16-23)
# --start_idx/--end_idx shard by index range like the reference; under
# multi-host JAX the per-host shard is derived automatically instead.
python object_reasoning.py \
    --sdf_activation tanh --use_bg_sdf \
    --objectness_resume ckpt/objectness_net_model.ckpt \
    --binary_classifier_resume ckpt/classifier_model.ckpt \
    --coco_image_dir "$COCO_IMG" --coco_annotations "$COCO_ANN" \
    --start_idx 0 --end_idx 100 \
    --image_batch 4 \
    --run_name disc \
    --analyze_cc

### 3. Object Scoring (reference script.sh:26-33)
python object_scoring.py \
    --sdf_activation tanh --use_bg_sdf \
    --objectness_resume ckpt/objectness_net_model.ckpt \
    --binary_classifier_resume ckpt/classifier_model.ckpt \
    --coco_image_dir "$COCO_IMG" --coco_annotations "$COCO_ANN" \
    --start_idx 0 --end_idx 100 \
    --raw_annotations_path results_reasoning/disc/discovery_results.json

### 4. Post-process objects for detector training (reference script.sh:36-43)
python post_process.py \
    --pred_annotations_path results_reasoning/disc/object_discovery_with_scores.json \
    --existence_score_thres 0.5 \
    --center_score_thres 0.8 \
    --boundary_score_thres 0.75 \
    --gt_annotation_path "$COCO_ANN" \
    --dataset COCO --split test

### 5. Merge COCO pseudo-labels with ImageNet VoteCut labels (script.sh:46-48)
# post_process writes selected_training_annotations.json NEXT TO its
# --pred_annotations_path input
python merge_coco_and_imagenet.py \
    --coco_annotations_training_format_path results_reasoning/disc/selected_training_annotations.json \
    --imagenet_annotations_training_format_path imagenet_train_votecut_kmax_3_tuam_0.2.json

### 6. Train the Class-Agnostic Detector (reference script.sh:51-53)
# device count comes from the JAX runtime; --num-gpus is accepted as an
# alias and checked against jax.device_count()
# image ids in the merged json carry coco_/imagenet_ prefixes; each
# prefix maps to its own image root (PREFIX=DIR form)
python cad/train_net.py \
    --config-file cad/configs/cascade_mask_rcnn_R_50_FPN.yaml \
    --train-json merged_with_imagenet/COCO_merged_IN_training_format.json \
    --image-root coco="$COCO_IMG" --image-root imagenet="$IMAGENET_DIR"

### 7. Evaluate (reference script.sh:56-62)
python cad/train_net.py \
    --config-file cad/configs/cascade_mask_rcnn_R_50_FPN.yaml \
    --eval-only \
    --test-dataset 'cls_agnostic_coco*_val_17' \
    --data-root "$DATA_ROOT" \
    MODEL.WEIGHTS cad_output/model_final.ckpt \
    OUTPUT_DIR 'cad_eval/cls_agnostic_coco*_val_17'
