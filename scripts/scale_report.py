"""Assemble the scale-validation report from the chain's artifacts.

The unattended chain (scripts/scale_chain_r5.sh -> scale_run_r5.sh)
leaves its evidence scattered across $WORK: stage wall-clocks in
``scale_timings.txt``, per-image discovery stats in
``discovery_stats_<tag>.json`` (via parse_discovery_stats.py), the
scoring CLI's device/host timing split in ``scoring_<tag>.log``,
pseudo-label AP in ``ap_score_pseudo.json``, the CAD run's metrics
JSONs, and the dense-tail A/Bs (``sticky_ab_results.json``,
``max_active_ab_results.json``). This script folds them into one JSON
(and a readable table) for STATUS.md — run it once when the chain
finishes:

    python scripts/scale_report.py --work /root/scale_r5 \
        --out /root/scale_r5/scale_report.json

``--tag`` defaults to auto-detection from the work dir's artifact names
(r5, r4, ...).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re


def parse_timings(path: str) -> dict:
    """``HH:MM:SS [@epoch] label ... start|done`` pairs -> stage wall seconds.

    The optional ``@<epoch-seconds>`` field (written by the chain's T()
    since round 5) is exact across any number of midnights; the
    clock-only fallback handles one wrap (ADVICE r4).
    """
    if not os.path.isfile(path):
        return {}
    starts, out = {}, {}
    with open(path) as f:
        for line in f:
            m = re.match(r"(\d\d):(\d\d):(\d\d) (?:@(\d+) )?(.+)", line.strip())
            if not m:
                continue
            if m.group(4):
                t, exact = int(m.group(4)), True
            else:
                t = int(m.group(1)) * 3600 + int(m.group(2)) * 60 + int(m.group(3))
                exact = False
            label = m.group(5)
            if label.endswith(" start"):
                starts[label[:-6]] = (t, exact)
            elif label.endswith(" done"):
                stage = label[:-5]
                # "post start" pairs with "post+eval done"
                key = "post" if stage == "post+eval" else stage
                if key in starts:
                    t0, exact0 = starts.pop(key)
                    dt = t - t0
                    if dt < 0 and not (exact and exact0):  # midnight wrap
                        dt += 24 * 3600
                    out[stage] = dt
    return out


def parse_scoring_log(path: str) -> dict:
    """Pull the timing split + throughput from the scoring CLI log.

    A multi-process sharded run interleaves one final split line per
    shard: device/host seconds are SUMMED across shards and
    ``n_scoring_shards`` reports how many were seen (ADVICE r4 —
    previously only the last shard's split survived).
    """
    if not os.path.isfile(path):
        return {}
    out: dict = {}
    split = re.compile(
        r"timing split: device ([\d.]+)s, host tail ([\d.]+)s \(host/device ([\d.]+)\)"
    )
    rate = re.compile(r"\[(\d+)/(\d+)\] images .*?\(([\d.]+) img/s\)")
    device_s, host_s, shards = 0.0, 0.0, 0
    with open(path) as f:
        for line in f:
            m = split.search(line)
            if m:
                device_s += float(m.group(1))
                host_s += float(m.group(2))
                shards += 1
            m = rate.search(line)
            if m:
                out["images_done"] = int(m.group(1))
                out["images_total"] = int(m.group(2))
                out["images_per_sec"] = float(m.group(3))
            if line.startswith("# of final annotations"):
                out["final_annotations"] = int(line.rsplit(None, 1)[-1])
    if shards:
        out["device_s"] = round(device_s, 1)
        out["host_tail_s"] = round(host_s, 1)
        out["host_over_device"] = round(host_s / max(device_s, 1e-9), 3)
        out["n_scoring_shards"] = shards
        if shards > 1:
            # the [k/n] progress rate is per-shard; flag it
            out["images_per_sec_is_per_shard"] = True
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


def parse_supervisor_events(work: str) -> dict:
    """Count supervisor interventions per stage log.

    The r5 resilience story is events + recovery, not just final
    outcomes: watchdog kills (output-silence and busy-wedge),
    relaunches, and how many already-processed images each restarted
    stage-2 CLI skipped via its partial-results file.
    """
    pats = {
        "hang_kills": re.compile(r"supervisor: no child output for"),
        "busy_wedge_kills": re.compile(r"relay wedge, not a compile"),
        "relaunches": re.compile(r"supervisor: restart \d+/"),
        "resumed_images": re.compile(r"resuming: (\d+) images already"),
    }
    out: dict = {}
    for path in sorted(glob.glob(os.path.join(work, "*.log"))):
        counts: dict = {}
        with open(path, errors="replace") as f:
            for line in f:
                for key, pat in pats.items():
                    m = pat.search(line)
                    if not m:
                        continue
                    inc = int(m.group(1)) if pat.groups else 1
                    counts[key] = counts.get(key, 0) + inc
        if counts:
            out[os.path.basename(path)] = counts
    return out


def newest_json(pattern: str):
    paths = glob.glob(pattern)
    if not paths:
        return None, None
    p = max(paths, key=os.path.getmtime)
    with open(p) as f:
        # keep the parent dir in the name: variant output dirs
        # (cad_r5 vs cad_r5_scenes) share metric file names
        return os.path.join(os.path.basename(os.path.dirname(p)), os.path.basename(p)), json.load(f)


def detect_tag(work: str) -> str:
    """Pick the chain tag (r5, r4, ...) from the work dir's artifacts."""
    hits = glob.glob(os.path.join(work, "discovery_stats_*.json")) + glob.glob(
        os.path.join(work, "scoring_*.log")
    )
    tags = sorted(
        {m.group(1) for p in hits for m in [re.search(r"_(r\d+)\.(?:json|log)$", p)] if m}
    )
    return tags[-1] if tags else "r5"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/root/scale_r5")
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--tag", default=None, help="chain tag (default: auto-detect)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    W = args.work
    tag = args.tag or detect_tag(W)

    report: dict = {"work_dir": W, "tag": tag}
    report["stage_wall_s"] = parse_timings(os.path.join(W, "scale_timings.txt"))

    disc_path = os.path.join(W, f"discovery_stats_{tag}.json")
    if os.path.isfile(disc_path):
        with open(disc_path) as f:
            report["discovery"] = json.load(f)

    report["scoring"] = parse_scoring_log(os.path.join(W, f"scoring_{tag}.log"))

    ap_path = os.path.join(W, "ap_score_pseudo.json")
    if os.path.isfile(ap_path):
        with open(ap_path) as f:
            report["pseudo_label_ap"] = json.load(f)

    # variant CAD output dirs (e.g. cad_r5_scenes, the scene-only
    # training-mix leg) share the glob; newest eval wins and the file
    # field carries its directory for provenance
    cad_name, cad_metrics = newest_json(os.path.join(W, f"cad_{tag}*", "metrics_*.json"))
    if cad_metrics:
        report["cad_final_eval"] = {"file": cad_name, "metrics": cad_metrics}
    report["cad_train"] = parse_cad_log(os.path.join(W, f"cad_{tag}.log"))
    scenes_log = os.path.join(W, f"cad_{tag}_scenes.log")
    if os.path.isfile(scenes_log):
        report["cad_train_scenes_only"] = parse_cad_log(scenes_log)

    # boundary-lattice truncation A/B (VERDICT r4 missing #2)
    ma_path = os.path.join(args.repo, "scripts", "max_active_ab_results.json")
    if os.path.isfile(ma_path):
        with open(ma_path) as f:
            report["max_active_ab"] = json.load(f)

    events = parse_supervisor_events(W)
    if events:
        report["supervisor_events"] = events

    failed = os.path.join(W, "failed_steps.txt")
    failed_steps: list = []
    if os.path.isfile(failed):
        with open(failed) as f:
            failed_steps = [l.strip() for l in f if l.strip()]
        report["failed_steps"] = failed_steps

    # sticky A/B with freshness verification (ADVICE r4, medium): only
    # label the results "dense" when they are verifiably NOT the stale
    # round-3 sparse archive and the step didn't fail
    sticky_path = os.path.join(args.repo, "scripts", "sticky_ab_results.json")
    if os.path.isfile(sticky_path):
        with open(sticky_path) as f:
            raw = f.read()
        sticky = json.loads(raw)
        arch = os.path.join(args.repo, "scripts", "sticky_ab_results_r3_sparse.json")
        stale_reason = None
        if os.path.isfile(arch):
            with open(arch) as f:
                if f.read() == raw:
                    stale_reason = "byte-identical to the r3 sparse archive"
        if any("sticky" in s for s in failed_steps):
            stale_reason = stale_reason or "step_sticky_ab in failed_steps"
        metas = [sticky.get(m, {}).get("meta") for m in ("sticky", "reference_rounds")]
        if stale_reason is None and not all(metas):
            stale_reason = "legs lack a provenance stamp (pre-r5 run)"
        if stale_reason is None and sticky.get("delta_legs_comparable") is False:
            stale_reason = "legs ran on different worlds (meta mismatch)"
        if stale_reason is None:
            report["sticky_ab_dense"] = sticky
        else:
            report["sticky_ab_dense"] = None
            report["sticky_ab_stale"] = {"reason": stale_reason, "results": sticky}

    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
