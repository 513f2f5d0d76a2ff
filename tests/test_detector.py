"""CAD detector tests: unit tests for loss semantics + a tiny end-to-end
train/inference pass (CPU, miniature dims)."""

import numpy as np
import jax
import jax.numpy as jnp

from unmore_tpu.detector.box_ops import (
    decode_deltas,
    encode_deltas,
    match_proposals,
    pairwise_iou_xyxy,
    subsample_labels,
)
from unmore_tpu.detector.cascade_rcnn import (
    CascadeMaskRCNN,
    DetectorConfig,
    detector_forward_inference,
    detector_forward_train,
)
from unmore_tpu.detector.heads import (
    crop_gt_mask_to_proposals,
    droploss_weights,
    mask_loss_weighted,
    softmax_ce_soft_targets,
)
from unmore_tpu.detector.roi_align import roi_align_level


def test_delta_roundtrip():
    rng = np.random.RandomState(0)
    src = rng.rand(20, 4) * 50
    src[:, 2:] += src[:, :2] + 5
    tgt = rng.rand(20, 4) * 50
    tgt[:, 2:] += tgt[:, :2] + 5
    for w in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        d = encode_deltas(jnp.asarray(src), jnp.asarray(tgt), w)
        back = decode_deltas(d, jnp.asarray(src), w)
        np.testing.assert_allclose(np.asarray(back), tgt, atol=1e-3)


def test_matcher_rpn_semantics():
    gt = jnp.asarray([[0.0, 0, 10, 10]])
    props = jnp.asarray(
        [[0.0, 0, 10, 10], [0, 0, 10, 6.5], [20, 20, 30, 30], [0, 0, 10, 2]]
    )
    iou = pairwise_iou_xyxy(gt, props)
    idx, labels = match_proposals(iou, thresholds=(0.3, 0.7), labels=(0, -1, 1))
    # exact match -> fg; IoU .65 -> ignore band; no overlap / IoU .2 -> bg
    assert labels.tolist() == [1, -1, 0, 0]
    # low-quality: the isolated gt's best match is forced fg
    gt2 = jnp.asarray([[20.0, 20, 30, 30]])
    iou2 = pairwise_iou_xyxy(gt2, props)
    _, labels2 = match_proposals(iou2, (0.3, 0.7), (0, -1, 1), allow_low_quality=True)
    assert labels2[2] == 1


def test_subsample_caps_positives():
    labels = jnp.asarray([1] * 50 + [0] * 100, jnp.int32)
    sampled, fg = subsample_labels(labels, 64, 0.25, jax.random.PRNGKey(0))
    assert int(jnp.sum(fg)) == 16  # 25% of 64
    assert int(jnp.sum(sampled)) == 64


def test_roi_align_constant_region():
    # pooling a constant-valued region must return that constant
    feat = jnp.ones((16, 16, 3)) * 5.0
    boxes = jnp.asarray([[8.0, 8.0, 40.0, 40.0]])  # stride 4 -> feature 2..10
    out = roi_align_level(feat, boxes, stride=4, out_size=7)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)
    # zero-padding outside: a box hanging off the map pools < 5
    boxes2 = jnp.asarray([[-40.0, -40.0, 24.0, 24.0]])
    out2 = roi_align_level(feat, boxes2, stride=4, out_size=7)
    assert float(out2.mean()) < 5.0


def test_roi_align_fpn_flat_matches_per_level_reference():
    # the production path pools from one flattened multi-level buffer;
    # it must equal the straightforward pool-every-level-and-select
    from unmore_tpu.detector.roi_align import FPN_STRIDES, assign_levels, roi_align_fpn

    rng = np.random.RandomState(7)
    S = 128
    feats = {
        n: jnp.asarray(rng.rand(S // s, S // s, 8).astype(np.float32))
        for n, s in FPN_STRIDES.items()
    }
    # box sizes spanning all four FPN bands (areas from ~30^2 to ~450^2,
    # in a virtual image larger than the canvas so clipping also hits)
    xy = rng.rand(64, 2).astype(np.float32) * 80
    wh = (rng.rand(64, 2).astype(np.float32) ** 2) * 420 + 30
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1))

    got = roi_align_fpn(feats, boxes, out_size=7, sampling=2)
    levels = assign_levels(boxes)
    want = None
    for n, stride in FPN_STRIDES.items():
        pooled = roi_align_level(feats[n], boxes, stride, 7, 2)
        sel = (levels == int(n[1]))[:, None, None, None]
        want = pooled * sel if want is None else want + pooled * sel
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_soft_target_ce_and_droploss():
    scores = jnp.asarray([[3.0, -3.0], [-3.0, 3.0], [0.0, 0.0]])
    fg = jnp.asarray([True, False, False])
    gt_score = jnp.asarray([1.0, 0.7, 0.2])
    valid = jnp.ones(3, bool)
    # perfect fg prediction + perfect bg prediction -> small loss
    loss = softmax_ce_soft_targets(scores, fg, gt_score, jnp.ones(3), valid)
    assert float(loss) < 0.3
    # dropping the uncertain proposal reduces the loss contribution
    w = jnp.asarray([1.0, 1.0, 0.0])
    loss_w = softmax_ce_soft_targets(scores, fg, gt_score, w, valid)
    assert float(loss_w) < float(loss)

    # droploss: predicted boxes far from all GT get weight 0, unless the
    # image is single-object
    pred = jnp.asarray([[0.0, 0, 10, 10], [50, 50, 60, 60]])
    gt = jnp.asarray([[0.0, 0, 10, 10]])
    w = droploss_weights(pred, gt, jnp.asarray([True]), jnp.asarray(0.0))
    assert w.tolist() == [1.0, 0.0]
    w1 = droploss_weights(pred, gt, jnp.asarray([True]), jnp.asarray(1.0))
    assert w1.tolist() == [1.0, 1.0]


def test_mask_target_cropping():
    # GT mask = left half of its box; proposal = right half of the GT box
    # -> target all zeros. proposal = left half -> target all ones.
    R = 16
    gt_masks = jnp.zeros((1, R, R)).at[:, :, : R // 2].set(1.0)
    gt_boxes = jnp.asarray([[10.0, 10.0, 50.0, 50.0]])
    matched = jnp.asarray([0, 0])
    proposals = jnp.asarray([[30.0, 10.0, 50.0, 50.0], [10.0, 10.0, 30.0, 50.0]])
    t = crop_gt_mask_to_proposals(gt_masks, gt_boxes, matched, proposals, out_size=8)
    assert float(t[0].mean()) < 0.05
    assert float(t[1].mean()) > 0.95
    # weighted mask loss: perfect logits -> low, wrong logits -> high
    logits = jnp.where(t > 0.5, 8.0, -8.0)
    fg = jnp.asarray([True, True])
    low = mask_loss_weighted(logits, t, fg, jnp.ones(2))
    high = mask_loss_weighted(-logits, t, fg, jnp.ones(2))
    assert float(low) < 0.01 < float(high)


def _tiny_cfg():
    return DetectorConfig(
        image_size=64,
        max_gt=8,
        gt_mask_res=16,
        rpn_pre_nms_topk_train=32,
        rpn_pre_nms_topk_test=16,
        rpn_post_nms_topk_train=32,
        rpn_post_nms_topk_test=16,
        stage_samples=8,
        detections_per_image=8,
        stage_blocks=(1, 1, 1, 1),
    )


def _tiny_batch(cfg, B=2):
    rng = np.random.RandomState(0)
    images = rng.rand(B, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    gt_boxes = np.zeros((B, cfg.max_gt, 4), np.float32)
    gt_valid = np.zeros((B, cfg.max_gt), bool)
    gt_scores = np.zeros((B, cfg.max_gt), np.float32)
    gt_masks = np.zeros((B, cfg.max_gt, cfg.gt_mask_res, cfg.gt_mask_res), np.float32)
    for b in range(B):
        for g in range(2):
            x1, y1 = rng.rand(2) * (cfg.image_size / 2)
            w, h = rng.rand(2) * (cfg.image_size / 4) + 10
            gt_boxes[b, g] = [x1, y1, min(x1 + w, cfg.image_size), min(y1 + h, cfg.image_size)]
            gt_valid[b, g] = True
            gt_scores[b, g] = 0.9
            gt_masks[b, g, 4:-4, 4:-4] = 1.0
    return {
        "images": jnp.asarray(images),
        "image_hw": jnp.asarray([[cfg.image_size, cfg.image_size]] * B, jnp.float32),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_scores": jnp.asarray(gt_scores),
        "gt_valid": jnp.asarray(gt_valid),
        "gt_masks": jnp.asarray(gt_masks),
        "is_single_object": jnp.asarray([float(b % 2) for b in range(B)]),
    }


def test_detector_train_and_inference_end_to_end():
    cfg = _tiny_cfg()
    model = CascadeMaskRCNN(cfg)
    batch = _tiny_batch(cfg)
    variables = jax.jit(
        lambda k: model.init(k, batch["images"], method=CascadeMaskRCNN.init_all)
    )(jax.random.PRNGKey(0))

    # ONE compiled value_and_grad covers both the loss surface and the
    # grad-flow checks (a separate eager forward + grad trace tripled
    # the compile cost of this test)
    def total(params):
        l, _ = detector_forward_train(
            model, {"params": params, "batch_stats": variables["batch_stats"]},
            cfg, batch, jax.random.PRNGKey(1),
        )
        return sum(jax.tree_util.tree_leaves(l)), l

    (_, losses), grads = jax.jit(jax.value_and_grad(total, has_aux=True))(variables["params"])
    expected = {
        "loss_rpn_cls", "loss_rpn_loc",
        "loss_cls_stage0", "loss_cls_stage1", "loss_cls_stage2",
        "loss_box_reg_stage0", "loss_box_reg_stage1", "loss_box_reg_stage2",
        "loss_mask",
    }
    assert expected <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    # gradients flow to every major submodule
    for mod in ("backbone", "rpn", "box_head0", "box_head1", "box_head2", "mask_head"):
        g = jax.tree_util.tree_leaves(grads[mod])
        assert any(float(jnp.abs(x).max()) > 0 for x in g), f"no grad in {mod}"

    out = jax.jit(
        lambda v, im, hw: detector_forward_inference(model, v, cfg, im, hw)
    )(variables, batch["images"], batch["image_hw"])
    assert out["boxes"].shape == (2, cfg.detections_per_image, 4)
    assert out["scores"].shape == (2, cfg.detections_per_image)
    assert out["masks"].shape == (2, cfg.detections_per_image, 28, 28)
    assert np.isfinite(np.asarray(out["scores"])[np.asarray(out["valid"])]).all()


def test_detector_inference_with_given_boxes():
    from unmore_tpu.detector.cascade_rcnn import detector_forward_with_boxes

    cfg = _tiny_cfg()
    model = CascadeMaskRCNN(cfg)
    batch = _tiny_batch(cfg)
    variables = jax.jit(
        lambda k: model.init(k, batch["images"], method=CascadeMaskRCNN.init_all)
    )(jax.random.PRNGKey(0))
    boxes = jnp.asarray(np.tile(np.array([[5.0, 5, 40, 40], [10, 10, 50, 50]], np.float32), (2, 1, 1)))
    valid = jnp.ones((2, 2), bool)
    out = jax.jit(
        lambda v, im, hw, b, va: detector_forward_with_boxes(model, v, cfg, im, hw, b, va)
    )(variables, batch["images"], batch["image_hw"], boxes, valid)
    assert out["boxes"].shape == (2, 2, 4)
    assert out["scores"].shape == (2, 2)
    assert out["masks"].shape == (2, 2, 28, 28)
    assert np.isfinite(np.asarray(out["scores"])).all()
