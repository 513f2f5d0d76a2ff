"""Parsers behind the scale-validation report assembler (scripts/scale_report.py)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    path = os.path.join(REPO, "scripts", "scale_report.py")
    spec = importlib.util.spec_from_file_location("scale_report", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parse_timings_pairs_and_midnight_wrap(tmp_path):
    sr = _load()
    p = tmp_path / "scale_timings.txt"
    p.write_text(
        "10:00:00 discovery seg 0-100 start\n"
        "11:30:00 discovery seg 0-100 done\n"
        "23:59:30 cad start\n"
        "00:00:30 cad done\n"
        "12:00:00 post start\n"
        "12:10:00 post+eval done\n"
        "12:11:00 scoring start\n"  # unmatched: no done line
    )
    out = sr.parse_timings(str(p))
    assert out["discovery seg 0-100"] == 5400
    assert out["cad"] == 60  # wrapped past midnight
    assert out["post+eval"] == 600  # "post start" pairs with "post+eval done"
    assert "scoring" not in out


def test_parse_scoring_log(tmp_path):
    sr = _load()
    p = tmp_path / "scoring_r4.log"
    p.write_text(
        "[4/500] images [1, 2, 3, 4]: (1.234 img/s)\n"
        "[500/500] images [497, 498, 499, 500]: (3.456 img/s)\n"
        "timing split: device 100.5s, host tail 20.3s (host/device 0.202)\n"
        "# of final annotations 5170\n"
    )
    out = sr.parse_scoring_log(str(p))
    assert out["images_done"] == 500 and out["images_total"] == 500
    assert out["images_per_sec"] == 3.456
    assert out["device_s"] == 100.5 and out["host_tail_s"] == 20.3
    assert out["host_over_device"] == 0.202
    assert out["final_annotations"] == 5170


def test_parse_timings_epoch_field_spans_days(tmp_path):
    sr = _load()
    p = tmp_path / "scale_timings.txt"
    # @epoch lines: a stage spanning >24h is exact (the clock-only
    # fallback would underreport by whole days — ADVICE r4)
    p.write_text(
        "10:00:00 @100000 cad start\n"
        "10:30:00 @190000 cad done\n"  # 25h later, same-ish clock time
        "09:00:00 @200000 scoring start\n"
        "08:59:00 @200120 scoring done\n"  # clock went "backwards"
    )
    out = sr.parse_timings(str(p))
    assert out["cad"] == 90000
    assert out["scoring"] == 120  # no bogus +24h wrap when epochs are exact


def test_parse_scoring_log_sums_shards(tmp_path):
    sr = _load()
    p = tmp_path / "scoring.log"
    p.write_text(
        "[250/250] images [247, 248, 249, 250]: (2.0 img/s)\n"
        "timing split: device 100.0s, host tail 10.0s (host/device 0.100)\n"
        "[250/250] images [497, 498, 499, 500]: (2.0 img/s)\n"
        "timing split: device 150.0s, host tail 40.0s (host/device 0.267)\n"
    )
    out = sr.parse_scoring_log(str(p))
    assert out["device_s"] == 250.0 and out["host_tail_s"] == 50.0
    assert out["host_over_device"] == 0.2
    assert out["n_scoring_shards"] == 2
    assert out["images_per_sec_is_per_shard"] is True


def test_sticky_freshness_gate(tmp_path):
    """The report must not label stale/unstamped A/B results as dense
    (ADVICE r4 medium)."""
    import json
    import subprocess
    import sys

    work = tmp_path / "work"
    work.mkdir()
    repo = tmp_path / "repo"
    (repo / "scripts").mkdir(parents=True)
    sparse = {"sticky": {"bbox_AP50": 0.5}, "delta": {"bbox_AP50": 0.01}}
    (repo / "scripts" / "sticky_ab_results.json").write_text(json.dumps(sparse))
    (repo / "scripts" / "sticky_ab_results_r3_sparse.json").write_text(json.dumps(sparse))

    def run():
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "scale_report.py"),
             "--work", str(work), "--repo", str(repo)],
            capture_output=True, text=True, check=True,
        )
        return json.loads(out.stdout)

    rep = run()
    assert rep["sticky_ab_dense"] is None
    assert "r3 sparse archive" in rep["sticky_ab_stale"]["reason"]

    # fresh, stamped, comparable legs pass the gate
    meta = {"n_images": 40, "start_idx": 0, "end_idx": 40, "synth": "/tmp/s",
            "max_active": None, "recorded_utc": "2026-08-18 10:00"}
    fresh = {
        "sticky": {"meta": meta, "bbox_AP50": 0.5},
        "reference_rounds": {"meta": meta, "bbox_AP50": 0.49},
        "delta": {"bbox_AP50": 0.01},
        "delta_legs_comparable": True,
    }
    (repo / "scripts" / "sticky_ab_results.json").write_text(json.dumps(fresh))
    rep = run()
    assert rep["sticky_ab_dense"]["delta"]["bbox_AP50"] == 0.01
    assert "sticky_ab_stale" not in rep

    # a failed step marks even a stamped file stale
    (work / "failed_steps.txt").write_text("step_sticky_ab\n")
    rep = run()
    assert rep["sticky_ab_dense"] is None


def test_parse_cad_log(tmp_path):
    sr = _load()
    p = tmp_path / "cad_r4.log"
    lines = [
        str({"total_loss": 1.2, "iteration": i, "ips": 5.0 + i / 100, "data_starved": 0.3})
        for i in range(0, 500, 20)
    ]
    p.write_text("\n".join(lines) + "\n")
    out = sr.parse_cad_log(str(p))
    assert out["img_per_sec_min"] <= out["img_per_sec_tail_mean"] <= out["img_per_sec_max"]
    assert out["data_starved_frac_last"] == 0.3


def test_parse_supervisor_events(tmp_path):
    mod = _load()
    (tmp_path / "disc_x.log").write_text(
        "result_folder results_reasoning/x\n"
        "supervisor: no child output for 2700s; killing hung child\n"
        "supervisor: child died (hang (no output)); relaunching in 2s\n"
        "supervisor: restart 1/3: python ...\n"
        "resuming: 4 images already discovered in partial_results_p0.jsonl; skipping them\n"
        "supervisor: child silent 900s while burning 80% CPU (relay wedge, not a compile); killing hung child\n"
        "supervisor: restart 2/3: python ...\n"
        "resuming: 12 images already discovered in partial_results_p0.jsonl; skipping them\n"
    )
    (tmp_path / "quiet.log").write_text("[4/96] image 108: stats\n")
    events = mod.parse_supervisor_events(str(tmp_path))
    assert events == {
        "disc_x.log": {
            "hang_kills": 1,
            "busy_wedge_kills": 1,
            "relaunches": 2,
            "resumed_images": 16,
        }
    }
