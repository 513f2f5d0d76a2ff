"""Aggregate per-image discovery stats from object_reasoning.py logs.

The discovery CLI prints one ``[k/n] image <id>: {stats} (r img/s)``
line per image. This parser collects them across any number of log
files (the scale run is segmented into fresh processes) and emits the
aggregate the scale report needs: image counts, throughput, lattice
overflow counters (split/cc/active), boundary-round distribution, and
a dense-vs-sparse split (scene ids <= ``--dense_upto`` are the packed
scenes in the round-4 synthetic world).

Usage: python scripts/parse_discovery_stats.py LOG [LOG ...] \
           [--dense_upto 50] [--out summary.json]
"""

from __future__ import annotations

import argparse
import ast
import json
import re

LINE = re.compile(r"\[\d+/\d+\] image (\d+): (\{.*\}) \(([\d.]+) img/s\)")


def parse_logs(paths):
    recs = {}
    rates = []  # (n_images, final cumulative img/s) per log/segment
    for path in paths:
        n_seg, last_rate = 0, None
        with open(path) as f:
            for line in f:
                m = LINE.search(line)
                if not m:
                    continue
                img = int(m.group(1))
                stats = ast.literal_eval(m.group(2))
                # tag the source segment: group dedup below keys on the
                # stats tuple, and two groups in DIFFERENT segments can
                # legitimately print identical stats (tiny worlds do) —
                # without the tag they'd collapse into one group
                stats["_segment"] = path
                recs[img] = stats  # retries overwrite: last attempt wins
                n_seg += 1
                last_rate = float(m.group(3))
        if n_seg and last_rate:
            rates.append((n_seg, last_rate))
    return recs, rates


PER_IMAGE_KEYS = ("n_final", "n_converged", "n_exist")


def summarize(recs: dict, dense_upto: int) -> dict:
    def agg(items):
        n = len(items)
        if not n:
            return {}
        # split/cc/active counters and the boundary trace are GROUP-level
        # (images in one image_batch share a lattice and print identical
        # group stats) — count each distinct group once, or a batch of 4
        # overcounts them 4x. Group identity = the group-level key tuple.
        groups = {}
        for s in items:
            key = tuple(
                (k, tuple(v) if isinstance(v, list) else v)
                for k, v in sorted(s.items())
                if k not in PER_IMAGE_KEYS
            )
            groups[key] = s
        gitems = list(groups.values())
        tot = lambda k: sum(s.get(k, 0) for s in gitems)  # noqa: E731
        rounds = [s.get("boundary_rounds", 0) for s in items]
        return {
            "images": n,
            "image_groups": len(gitems),
            "seed_boxes_total": tot("n_seed"),
            "final_boxes": sum(s.get("n_final", 0) for s in items),
            "converged_boxes": sum(s.get("n_converged", 0) for s in items),
            "split_overflow_total": tot("split_overflow"),
            "cc_overflow_total": tot("cc_overflow"),
            "active_overflow_total": tot("active_overflow"),
            "groups_with_active_overflow": sum(
                1 for s in gitems if s.get("active_overflow", 0) > 0
            ),
            "groups_with_split_overflow": sum(
                1 for s in gitems if s.get("split_overflow", 0) > 0
            ),
            "boundary_rounds_mean": round(sum(rounds) / n, 1),
            "boundary_crops_total": sum(
                sum(s.get("boundary_active_trace", [])) for s in gitems
            ),
        }

    dense = [s for i, s in recs.items() if i <= dense_upto]
    sparse = [s for i, s in recs.items() if i > dense_upto]
    return {
        "all": agg(list(recs.values())),
        "dense_scenes": agg(dense),
        "sparse_scenes": agg(sparse),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--dense_upto", type=int, default=50)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    recs, rates = parse_logs(args.logs)
    summary = summarize(recs, args.dense_upto)
    if rates:
        # each segment's printed rate is cumulative within its process;
        # aggregate = total images / total time reconstructed per segment
        total_imgs = sum(n for n, _ in rates)
        total_time = sum(n / r for n, r in rates)
        summary["images_per_sec"] = round(total_imgs / total_time, 4)
        summary["segments"] = [
            {"images": n, "images_per_sec": r} for n, r in rates
        ]
    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
