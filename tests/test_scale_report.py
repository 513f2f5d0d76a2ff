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
