"""Assemble the round-4 scale-validation report from the chain's artifacts.

The unattended chain (scripts/scale_chain_r4.sh -> scale_run_r4.sh)
leaves its evidence scattered across $WORK: stage wall-clocks in
``scale_timings.txt``, per-image discovery stats in
``discovery_stats_r4.json`` (via parse_discovery_stats.py), the scoring
CLI's device/host timing split in ``scoring_r4.log``, pseudo-label AP in
``ap_score_pseudo.json``, the CAD run's metrics JSONs, and the dense
sticky A/B in ``sticky_ab_results.json``. This script folds them into
one JSON (and a readable table) for STATUS.md — run it once when the
chain finishes:

    python scripts/scale_report.py --work /root/scale_r4 \
        --out /root/scale_r4/scale_report.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re


def parse_timings(path: str) -> dict:
    """``HH:MM:SS label ... start|done`` pairs -> stage wall seconds."""
    if not os.path.isfile(path):
        return {}
    starts, out = {}, {}
    with open(path) as f:
        for line in f:
            m = re.match(r"(\d\d):(\d\d):(\d\d) (.+)", line.strip())
            if not m:
                continue
            t = int(m.group(1)) * 3600 + int(m.group(2)) * 60 + int(m.group(3))
            label = m.group(4)
            if label.endswith(" start"):
                starts[label[:-6]] = t
            elif label.endswith(" done"):
                stage = label[:-5]
                # "post start" pairs with "post+eval done"
                key = "post" if stage == "post+eval" else stage
                if key in starts:
                    dt = t - starts.pop(key)
                    if dt < 0:  # midnight wrap
                        dt += 24 * 3600
                    out[stage] = dt
    return out


def parse_scoring_log(path: str) -> dict:
    """Pull the final timing split + throughput from the scoring CLI log."""
    if not os.path.isfile(path):
        return {}
    out: dict = {}
    split = re.compile(
        r"timing split: device ([\d.]+)s, host tail ([\d.]+)s \(host/device ([\d.]+)\)"
    )
    rate = re.compile(r"\[(\d+)/(\d+)\] images .*?\(([\d.]+) img/s\)")
    with open(path) as f:
        for line in f:
            m = split.search(line)
            if m:
                out["device_s"] = float(m.group(1))
                out["host_tail_s"] = float(m.group(2))
                out["host_over_device"] = float(m.group(3))
            m = rate.search(line)
            if m:
                out["images_done"] = int(m.group(1))
                out["images_total"] = int(m.group(2))
                out["images_per_sec"] = float(m.group(3))
            if line.startswith("# of final annotations"):
                out["final_annotations"] = int(line.rsplit(None, 1)[-1])
    return out


def parse_cad_log(path: str) -> dict:
    """Sustained throughput + starvation from the CAD train log tail."""
    if not os.path.isfile(path):
        return {}
    rates, starved = [], []
    # the CAD trainer prints one metrics dict per log window, e.g.
    # {'total_loss': ..., 'iteration': 500, 'ips': 7.93, 'data_starved': 0.27}
    ips = re.compile(r"'ips': ([\d.]+)")
    starve = re.compile(r"'data_starved': ([\d.]+)")
    with open(path) as f:
        for line in f:
            m = ips.search(line)
            if m:
                rates.append(float(m.group(1)))
            m = starve.search(line)
            if m:
                starved.append(float(m.group(1)))
    out: dict = {}
    if rates:
        tail = rates[-20:]
        out["img_per_sec_tail_mean"] = round(sum(tail) / len(tail), 2)
        out["img_per_sec_min"] = min(tail)
        out["img_per_sec_max"] = max(tail)
    if starved:
        out["data_starved_frac_last"] = starved[-1]
    return out


def newest_json(pattern: str):
    paths = glob.glob(pattern)
    if not paths:
        return None, None
    p = max(paths, key=os.path.getmtime)
    with open(p) as f:
        return os.path.basename(p), json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/root/scale_r4")
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    W = args.work

    report: dict = {"work_dir": W}
    report["stage_wall_s"] = parse_timings(os.path.join(W, "scale_timings.txt"))

    disc_path = os.path.join(W, "discovery_stats_r4.json")
    if os.path.isfile(disc_path):
        with open(disc_path) as f:
            report["discovery"] = json.load(f)

    report["scoring"] = parse_scoring_log(os.path.join(W, "scoring_r4.log"))

    ap_path = os.path.join(W, "ap_score_pseudo.json")
    if os.path.isfile(ap_path):
        with open(ap_path) as f:
            report["pseudo_label_ap"] = json.load(f)

    cad_name, cad_metrics = newest_json(os.path.join(W, "cad_r4", "metrics_*.json"))
    if cad_metrics:
        report["cad_final_eval"] = {"file": cad_name, "metrics": cad_metrics}
    report["cad_train"] = parse_cad_log(os.path.join(W, "cad_r4.log"))

    sticky_path = os.path.join(args.repo, "scripts", "sticky_ab_results.json")
    if os.path.isfile(sticky_path):
        with open(sticky_path) as f:
            report["sticky_ab_dense"] = json.load(f)

    failed = os.path.join(W, "failed_steps.txt")
    if os.path.isfile(failed):
        with open(failed) as f:
            report["failed_steps"] = [l.strip() for l in f if l.strip()]

    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
