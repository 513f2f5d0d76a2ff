"""Detector eval plumbing: YAML config loader + detections->COCO conversion."""

import numpy as np

from unmore_tpu.detector.config_yaml import apply_opts, get, load_yacs_config
from unmore_tpu.detector.evaluation import detections_to_coco, prepare_eval_image
from unmore_tpu.utils import rle


def test_yaml_config_with_base_and_opts(tmp_path):
    (tmp_path / "base.yaml").write_text(
        "MODEL:\n  MASK_ON: true\n  RPN:\n    NMS_THRESH: 0.7\nSOLVER:\n  BASE_LR: 0.02\n"
    )
    (tmp_path / "child.yaml").write_text(
        '_BASE_: "base.yaml"\nMODEL:\n  RPN:\n    NMS_THRESH: 0.65\n'
    )
    cfg = load_yacs_config(str(tmp_path / "child.yaml"))
    assert get(cfg, "MODEL.MASK_ON") is True
    assert get(cfg, "MODEL.RPN.NMS_THRESH") == 0.65
    assert get(cfg, "SOLVER.BASE_LR") == 0.02
    apply_opts(cfg, ["MODEL.WEIGHTS", "x.ckpt", "SOLVER.BASE_LR", "0.01"])
    assert get(cfg, "MODEL.WEIGHTS") == "x.ckpt"
    assert get(cfg, "SOLVER.BASE_LR") == 0.01


def test_prepare_eval_image_scaling():
    img = np.random.RandomState(0).rand(300, 400, 3).astype(np.float32)
    canvas, scale, (nh, nw) = prepare_eval_image(img, canvas_size=256, min_size=200)
    # canvas cap dominates: 256/400 = 0.64
    assert abs(scale - 0.64) < 1e-6
    assert (nh, nw) == (192, 256)
    assert canvas.shape == (256, 256, 3)
    assert np.all(canvas[nh:] == 0)


def test_detections_to_coco_inverts_scale_and_encodes_masks():
    dets = {
        "boxes": np.array([[[10.0, 20.0, 50.0, 60.0], [0, 0, 0, 0]]]),
        "scores": np.array([[0.8, 0.0]]),
        "valid": np.array([[True, False]]),
        "masks": np.ones((1, 2, 28, 28), np.float32),
    }
    anns = detections_to_coco(dets, image_id=5, scale=0.5, orig_hw=(200, 200))
    assert len(anns) == 1
    a = anns[0]
    assert a["image_id"] == 5 and a["category_id"] == 1
    np.testing.assert_allclose(a["bbox"], [20, 40, 80, 80])
    mask = rle.decode(a["segmentation"])
    assert mask.shape == (200, 200)
    # mask concentrated inside the (scaled-back) box
    assert mask[45:115, 25:95].mean() > 0.9
    assert mask[:35].sum() == 0


def test_predict_batch_mixed_sizes_matches_single():
    """predict_batch on [img_a, img_b] must equal two predict_image calls
    (per-image scales/canvases are independent inside one jitted batch)."""
    import jax.numpy as jnp
    import jax

    from unmore_tpu.detector.cascade_rcnn import CascadeMaskRCNN, DetectorConfig
    from unmore_tpu.detector.evaluation import DetectorEvaluator

    cfg = DetectorConfig(
        image_size=64, max_gt=8, gt_mask_res=16,
        rpn_pre_nms_topk_train=32, rpn_pre_nms_topk_test=16,
        rpn_post_nms_topk_train=32, rpn_post_nms_topk_test=16,
        stage_samples=16, detections_per_image=8, dtype=jnp.float32,
    )
    model = CascadeMaskRCNN(cfg)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 3)), method=CascadeMaskRCNN.init_all)
    )(jax.random.PRNGKey(0))
    ev = DetectorEvaluator(model, variables, cfg, min_size_test=48)

    rng = np.random.RandomState(3)
    img_a = rng.rand(40, 60, 3).astype(np.float32)
    img_b = rng.rand(64, 32, 3).astype(np.float32)

    batched = ev.predict_batch([img_a, img_b], [101, 202])
    singles = ev.predict_image(img_a, 101) + ev.predict_image(img_b, 202)
    assert {a["image_id"] for a in batched} <= {101, 202}
    assert len(batched) == len(singles)
    for got, want in zip(
        sorted(batched, key=lambda a: (a["image_id"], -a["score"])),
        sorted(singles, key=lambda a: (a["image_id"], -a["score"])),
    ):
        assert got["image_id"] == want["image_id"]
        np.testing.assert_allclose(got["bbox"], want["bbox"], atol=1e-3)
        np.testing.assert_allclose(got["score"], want["score"], atol=1e-5)
