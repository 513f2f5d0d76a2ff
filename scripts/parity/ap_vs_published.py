"""Stage-2 AP parity vs the published reference results.

Given the reference's published discovery/scoring JSON
(`unMORE_disc_coco_val17` from the README download links,
reference README.md:253-268) and the class-agnostic COCO val2017 GT,
this evaluates BOTH prediction sets with the in-repo evaluator and
prints them side by side — the acceptance check for stage-2 parity
(SURVEY §7 phase 3: "AP-parity vs published unMORE_disc_coco_val17").

  python scripts/parity/ap_vs_published.py \
      --published unMORE_disc_coco_val17.json \
      --ours results_scoring/<run>/object_discovery_with_scores.json \
      --gt coco_cls_agnostic_instances_val2017.json [--segm]

With only --published it reports the published numbers (a sanity check
that our evaluator reproduces the paper's table on their predictions).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from unmore_tpu.evaluation.coco_eval import evaluate_ap


def load_preds(path):
    with open(path) as f:
        data = json.load(f)
    if isinstance(data, dict) and "annotations" in data:
        data = data["annotations"]
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--published", required=True)
    ap.add_argument("--ours", default=None)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--segm", action="store_true")
    ap.add_argument("--ap50_tolerance", type=float, default=0.5,
                    help="max AP50 gap (points) for PASS (BASELINE.json)")
    args = ap.parse_args()

    tasks = ("bbox", "segm") if args.segm else ("bbox",)
    rows = {"published": evaluate_ap(args.gt, load_preds(args.published), iou_types=tasks)}
    if args.ours:
        rows["ours"] = evaluate_ap(args.gt, load_preds(args.ours), iou_types=tasks)

    for task in tasks:
        print(f"[{task}]")
        keys = list(next(iter(rows.values()))[task])
        header = "          " + "".join(f"{k:>8s}" for k in keys)
        print(header)
        for name, metrics in rows.items():
            print(f"{name:>10s}" + "".join(f"{100 * metrics[task][k]:8.2f}" for k in keys))
        if "ours" in rows:
            gap = 100 * (rows["published"][task]["AP50"] - rows["ours"][task]["AP50"])
            status = "PASS" if gap <= args.ap50_tolerance else "FAIL"
            print(f"AP50 gap (published - ours): {gap:+.2f} points -> {status}")


if __name__ == "__main__":
    main()
