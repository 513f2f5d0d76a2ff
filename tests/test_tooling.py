"""Dataset-construction tooling tests: VoteCut preprocessing, COCO* merge,
dataset registry."""

import json
import os
import subprocess
import sys

import cv2
import numpy as np

from unmore_tpu.data.registry import EVAL_DATASETS, resolve_dataset
from unmore_tpu.utils import rle
from coco_star.merge_extra_labels import merge_annotations, to_class_agnostic

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_registry_resolves_all_names(tmp_path):
    for name in EVAL_DATASETS:
        img_dir, ann = resolve_dataset(name, str(tmp_path))
        assert ann.endswith(".json")
    try:
        resolve_dataset("nope", str(tmp_path))
        assert False
    except KeyError:
        pass


def test_coco_star_merge():
    original = {
        "images": [{"id": 1}],
        "annotations": [{"id": 7, "image_id": 1, "category_id": 3, "bbox": [0, 0, 5, 5]}],
        "categories": [{"id": 3, "name": "cat"}],
    }
    extra = {
        "images": [{"id": 1}],
        "annotations": [{"id": 9, "image_id": 1, "category_id": 99, "bbox": [5, 5, 5, 5]}],
        "categories": [{"id": 99, "name": "weird"}, {"id": 3, "name": "cat"}],
    }
    merged = merge_annotations(original, extra)
    assert [c["id"] for c in merged["categories"]] == [3, 99]
    assert [a["id"] for a in merged["annotations"]] == [0, 1]
    agnostic = to_class_agnostic(merged)
    assert all(a["category_id"] == 1 for a in agnostic["annotations"])
    assert agnostic["categories"] == [{"id": 1, "name": "fg", "supercategory": "fg"}]


def test_preprocess_votecut_top1_and_full(tmp_path):
    # two annotations; top-1 by weight has two components -> keep largest
    m1 = np.zeros((20, 20), np.uint8)
    m1[2:8, 2:8] = 1  # 36 px
    m1[12:15, 12:15] = 1  # 9 px, smaller component
    m2 = np.zeros((20, 20), np.uint8)
    m2[10:12, 0:2] = 1
    ann_file = tmp_path / "votecut.json"
    with open(ann_file, "w") as f:
        json.dump(
            {
                "images": [{"id": 1, "file_name": "n01/x.JPEG", "height": 20, "width": 20}],
                "annotations": [
                    {"id": 1, "image_id": 1, "weight": 0.9, "segmentation": rle.encode(m1)},
                    {"id": 2, "image_id": 1, "weight": 0.2, "segmentation": rle.encode(m2)},
                ],
            },
            f,
        )
    for mode, sub in (("top1", "masks_top1_single_component"), ("full", "masks")):
        out = tmp_path / mode
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "utils", "preprocess_votecut.py"),
             "--annotation_file", str(ann_file), "--dest_folder", str(out), "--mode", mode],
            capture_output=True, text=True,
        )
        assert r.returncode == 0, r.stderr
        png = cv2.imread(str(out / sub / "n01" / "x.png"), cv2.IMREAD_GRAYSCALE)
        assert png is not None
        if mode == "top1":
            assert (png[2:8, 2:8] == 255).all()
            assert (png[12:15, 12:15] == 0).all()  # smaller component dropped
        else:
            assert set(np.unique(png)) == {0, 1, 2}


def test_vis_votecut_writes_id_masks_and_previews(tmp_path):
    # counterpart of reference utils/vis_votecut.py: instance-id PNGs
    # (densified ids) + hue-colorized previews from a votecut JSON
    import importlib.util
    import cv2
    import json as _json
    import numpy as _np

    from unmore_tpu.utils import rle as _rle

    m1 = _np.zeros((40, 50), _np.uint8); m1[5:20, 5:25] = 1
    m2 = _np.zeros((40, 50), _np.uint8); m2[25:38, 30:48] = 1
    data = {
        "images": [{"id": 1, "file_name": "n001/a.JPEG", "height": 40, "width": 50}],
        "annotations": [
            {"id": 10, "image_id": 1, "segmentation": _rle.encode(m1), "weight": 0.9},
            {"id": 11, "image_id": 1, "segmentation": _rle.encode(m2), "weight": 0.5},
        ],
    }
    jp = tmp_path / "votecut.json"
    jp.write_text(_json.dumps(data))
    path = os.path.join(os.path.dirname(__file__), "..", "utils", "vis_votecut.py")
    spec = importlib.util.spec_from_file_location("vvc_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(["--votecut_json", str(jp), "--out_dir", str(tmp_path / "out")])
    mask = cv2.imread(str(tmp_path / "out" / "masks" / "n001" / "a.png"), cv2.IMREAD_GRAYSCALE)
    assert set(_np.unique(mask)) == {0, 1, 2}
    vis = cv2.imread(str(tmp_path / "out" / "masks_vis" / "n001" / "a.png"))
    assert vis is not None and vis.max() > 0


def test_parse_discovery_stats_dedupes_group_counters(tmp_path):
    """Images in one image_batch print identical group-level stats; the
    parser must count shared-lattice counters once per group while
    summing per-image fields (overcounting bit round 4's scale report)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from parse_discovery_stats import parse_logs, summarize

    group = {
        "n_seed": 10, "n_split": 5, "split_overflow": 3,
        "active_overflow": 7, "cc_overflow": 0,
        "boundary_rounds": 50, "boundary_active_trace": [4, 2, 1],
    }
    lines = []
    for img, n_final in [(0, 2), (1, 3)]:  # one group of 2
        s = dict(group, n_final=n_final, n_converged=n_final + 1)
        lines.append(f"[2/4] image {img}: {s} (0.060 img/s)")
    other = dict(group, n_split=6, n_final=4, n_converged=5)
    lines.append(f"[4/4] image 2: {other} (0.061 img/s)")  # second group
    log = tmp_path / "d.log"
    log.write_text("\n".join(lines) + "\n")

    recs, rates = parse_logs([str(log)])
    assert rates == [(3, 0.061)]  # per-segment (n_images, last cumulative rate)
    out = summarize(recs, dense_upto=1)
    assert out["all"]["images"] == 3
    assert out["all"]["image_groups"] == 2
    assert out["all"]["final_boxes"] == 2 + 3 + 4
    assert out["all"]["split_overflow_total"] == 3 + 3  # once per group
    assert out["all"]["active_overflow_total"] == 7 + 7
    assert out["all"]["boundary_crops_total"] == 7 + 7
    assert out["dense_scenes"]["images"] == 2
    assert out["sparse_scenes"]["image_groups"] == 1


def test_coco_images_subset_json_over_full_dir(tmp_path):
    """A subset annotations JSON over a full image directory must yield
    the subset (the JSON is the source of truth, reference
    datasets.py:404-426) — found the hard way when a 24-scene eval
    KeyError'd on the 500-image world dir (r5 scale chain)."""
    from unmore_tpu.data.coco import COCOImages

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for i in range(5):
        cv2.imwrite(str(img_dir / f"{i:04d}.jpg"), np.full((8, 8, 3), 40 * i, np.uint8))
    images = [{"id": 10 + i, "file_name": f"{i:04d}.jpg", "width": 8, "height": 8} for i in (1, 3)]
    gt = {"images": images, "annotations": [], "categories": []}
    path = tmp_path / "subset.json"
    path.write_text(json.dumps(gt))
    ds = COCOImages(str(img_dir), str(path))
    assert len(ds) == 2
    assert [ds.image_id(i) for i in range(2)] == [11, 13]
    arr, image_id = ds.get(0)
    assert image_id == 11 and arr.shape == (8, 8, 3)
