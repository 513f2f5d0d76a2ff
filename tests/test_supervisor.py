"""Retry-supervisor + corruption-hardening tests.

The fail-fast design (unmore_tpu/train/resilience.py) promises: on
persistent device corruption the trainer exits(3) WITHOUT saving and a
supervisor relaunches it with --resume from the last periodic
checkpoint. These tests cover the contract end to end: the detector
semantics (warmup exemption, save-skip window), the supervisor loop
(bounded restarts, retryable codes), and a slow-lane fault-injection
run through the real CAD CLI that survives an injected corruption
event unattended.
"""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_stage1_cli():
    path = os.path.join(REPO, "train_objectness_net.py")
    spec = importlib.util.spec_from_file_location("stage1_train_net", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ------------------------------------------------------ detector hardening


def test_loss_window_corrupt_warmup_exemption():
    from unmore_tpu.train.resilience import CorruptionDetector

    d = CorruptionDetector()
    # a finite-but-large early loss under LR warmup must NOT trip
    # fail-fast (ADVICE r3: the 1e3 ceiling was hard-coded and untested
    # against legitimately-large warmup losses)
    assert not d.loss_window_corrupt(5300.0, in_warmup=True)
    assert d.loss_window_corrupt(5300.0, in_warmup=False)
    # non-finite is corrupt even during warmup
    assert d.loss_window_corrupt(float("nan"), in_warmup=True)
    assert d.loss_window_corrupt(float("inf"), in_warmup=True)
    # the ceiling is configurable (cad/train_net.py --corrupt-loss-ceiling)
    assert d.loss_window_corrupt(200.0, ceiling=100.0)
    assert not d.loss_window_corrupt(200.0, ceiling=1e4)


def test_last_window_corrupt_gates_checkpoint_saves():
    from unmore_tpu.train.resilience import CorruptionDetector

    d = CorruptionDetector()
    assert not d.last_window_corrupt
    d.update(True)
    # one corrupt window: not fatal yet, but a checkpoint written now
    # would snapshot suspect state (ADVICE r3: a periodic save landing
    # in the detection window poisons the resume point)
    assert d.last_window_corrupt
    d.update(False)
    assert not d.last_window_corrupt


def test_fault_injection_env_contract(tmp_path, monkeypatch):
    from unmore_tpu.train import resilience as r

    marker = str(tmp_path / "fired")
    monkeypatch.delenv("UNMORE_FAULT_INJECT_AT", raising=False)
    assert not r.fault_injection_active(10)
    r.mark_fault_injected()  # no-op when unarmed
    assert not os.path.exists(marker)

    monkeypatch.setenv("UNMORE_FAULT_INJECT_AT", f"30:{marker}")
    assert not r.fault_injection_active(20)
    assert r.fault_injection_active(30)
    assert r.fault_injection_active(31)
    r.mark_fault_injected()
    assert os.path.exists(marker)
    # restarted processes see the marker and train cleanly
    assert not r.fault_injection_active(31)

    monkeypatch.setenv("UNMORE_FAULT_INJECT_AT", "no-marker")
    with pytest.raises(ValueError):
        r.fault_injection_active(1)


# ------------------------------------------------------- supervisor module


def test_retryable_codes():
    from unmore_tpu.train.supervisor import retryable

    assert not retryable(0)     # clean finish
    assert not retryable(2)     # argparse usage error: deterministic
    assert retryable(3)         # corruption fail-fast
    assert retryable(1)         # crash
    assert retryable(-9)        # killed


def test_strip_flag_spellings():
    from unmore_tpu.train.supervisor import strip_flag

    argv = ["--a", "1", "--max-restarts", "5", "--b", "--max-restarts=7", "--c", "2"]
    assert strip_flag(argv, "--max-restarts", True) == ["--a", "1", "--b", "--c", "2"]
    assert strip_flag(["--resume", "--x"], "--resume", False) == ["--x"]


def test_supervise_restarts_until_success(tmp_path):
    from unmore_tpu.train.supervisor import supervise

    marker = str(tmp_path / "marker")
    log = str(tmp_path / "attempts.txt")
    # a stub trainer: fails with the corruption code once, then succeeds
    script = (
        "import os, sys\n"
        f"open({log!r}, 'a').write(sys.argv[1] + chr(10))\n"
        f"if not os.path.exists({marker!r}):\n"
        f"    open({marker!r}, 'w').close()\n"
        "    sys.exit(3)\n"
        "sys.exit(0)\n"
    )

    def build(attempt):
        return [sys.executable, "-c", script, f"attempt{attempt}"]

    rc = supervise(build, max_restarts=3, restart_delay=0.0)
    assert rc == 0
    with open(log) as f:
        assert f.read().splitlines() == ["attempt0", "attempt1"]


def test_supervise_budget_exhausted():
    from unmore_tpu.train.supervisor import supervise

    calls = []

    def build(attempt):
        calls.append(attempt)
        return [sys.executable, "-c", "import sys; sys.exit(3)"]

    rc = supervise(build, max_restarts=2, restart_delay=0.0)
    assert rc == 3
    assert calls == [0, 1, 2]  # first launch + 2 restarts


def test_supervise_usage_error_not_retried():
    from unmore_tpu.train.supervisor import supervise

    calls = []

    def build(attempt):
        calls.append(attempt)
        return [sys.executable, "-c", "import sys; sys.exit(2)"]

    assert supervise(build, max_restarts=5, restart_delay=0.0) == 2
    assert calls == [0]


def test_supervise_hang_watchdog_kills_and_restarts(tmp_path):
    """A child that goes silent (relay-wedge hang: blocked in a device
    call, never exits — STATUS round-4 incident) is killed after
    hang_timeout and restarted like any crash."""
    from unmore_tpu.train.supervisor import supervise

    marker = str(tmp_path / "hung_once")
    # attempt 0: print one line then hang forever; attempt 1: exit 0
    script = (
        "import os, sys, time\n"
        f"if not os.path.exists({marker!r}):\n"
        f"    open({marker!r}, 'w').close()\n"
        "    print('starting', flush=True)\n"
        "    time.sleep(120)\n"
        "sys.exit(0)\n"
    )
    msgs = []

    def build(attempt):
        return [sys.executable, "-I", "-c", script]

    rc = supervise(
        build, max_restarts=2, restart_delay=0.0,
        log=msgs.append, hang_timeout=10.0,
    )
    assert rc == 0
    assert any("killing hung child" in m for m in msgs)
    assert any("hang (no output)" in m for m in msgs)


def test_supervise_busy_wedge_killed_early(tmp_path):
    """A silent child that burns CPU (the relay-wedge signature: the
    client spins inside a stalled device call — round-4 incident at
    iter 4600) is killed at busy_hang_timeout, well before the full
    hang_timeout that a remote compile legitimately needs."""
    import time as _time

    from unmore_tpu.train.supervisor import supervise

    marker = str(tmp_path / "wedged_once")
    # attempt 0: print once then spin silently; attempt 1: exit 0
    script = (
        "import os, sys\n"
        f"if not os.path.exists({marker!r}):\n"
        f"    open({marker!r}, 'w').close()\n"
        "    print('starting', flush=True)\n"
        "    while True:\n"
        "        pass\n"
        "sys.exit(0)\n"
    )
    msgs = []
    t0 = _time.monotonic()
    rc = supervise(
        lambda attempt: [sys.executable, "-I", "-c", script],
        max_restarts=1, restart_delay=0.0, log=msgs.append,
        hang_timeout=300.0, busy_hang_timeout=8.0,
    )
    elapsed = _time.monotonic() - t0
    assert rc == 0
    assert any("relay wedge, not a compile" in m for m in msgs), msgs
    assert elapsed < 60.0, f"busy wedge not killed early ({elapsed:.0f}s)"


def test_supervise_idle_silence_gets_full_grace(tmp_path):
    """A silent child at ~0% CPU (a remote compile blocking on the
    network) must NOT trip the busy-wedge kill — only the full
    hang_timeout applies."""
    from unmore_tpu.train.supervisor import supervise

    # sleeps silently past busy_hang_timeout, then finishes cleanly
    script = "import time; print('up', flush=True); time.sleep(12); print('done', flush=True)"
    msgs = []
    rc = supervise(
        lambda attempt: [sys.executable, "-I", "-c", script],
        max_restarts=0, log=msgs.append,
        hang_timeout=120.0, busy_hang_timeout=6.0,
    )
    assert rc == 0
    assert not msgs, msgs


def test_supervise_watchdog_spares_talkative_child(capfd):
    """Steady output resets the watchdog; the child finishes untouched
    and its stdout passes through the supervisor verbatim."""
    from unmore_tpu.train.supervisor import supervise

    script = (
        "import time\n"
        "for i in range(4):\n"
        "    print('tick', i, flush=True)\n"
        "    time.sleep(1.0)\n"
    )
    msgs = []
    rc = supervise(
        lambda attempt: [sys.executable, "-I", "-c", script],
        max_restarts=0, log=msgs.append, hang_timeout=25.0,
    )
    assert rc == 0
    assert not msgs
    assert "tick 3" in capfd.readouterr().out


# -------------------------------------------------- stage-1 CLI plumbing


def test_run_dir_of_ckpt_fallback(tmp_path):
    cli = _load_stage1_cli()
    assert cli._run_dir_of_ckpt("results/run7/ckpt/iter_5000_model.ckpt") == "results/run7"
    # a checkpoint outside the run-dir layout falls back to its directory
    # instead of producing a path under the checkpoint FILE (ADVICE r3:
    # os.makedirs on that raised NotADirectoryError)
    loose = tmp_path / "model.ckpt"
    loose.write_bytes(b"")
    assert cli._run_dir_of_ckpt(str(loose)) == str(tmp_path)


def test_find_last_stage1_checkpoint(tmp_path):
    cli = _load_stage1_cli()
    assert cli.find_last_stage1_checkpoint(str(tmp_path)) is None
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    for n in (500, 5000, 2500):
        (ckpt_dir / f"iter_{n}_model.ckpt").write_bytes(b"")
    (ckpt_dir / "iter_bad_model.ckpt").write_bytes(b"")
    assert cli.find_last_stage1_checkpoint(str(tmp_path)).endswith("iter_5000_model.ckpt")


# ------------------------------------- end-to-end fault-injection (slow)


@pytest.mark.slow
def test_cad_supervised_run_survives_injected_corruption(tmp_path):
    """Unattended CAD run with --max-restarts survives a corruption
    event: the child fail-fasts at the injected window WITHOUT saving,
    the supervisor relaunches with --resume from the last healthy
    checkpoint, and the run completes to max_iter (VERDICT r3 item 2)."""
    from test_cad_cli import _tiny_dataset

    img_dir, json_path = _tiny_dataset(str(tmp_path))
    out_dir = str(tmp_path / "out")
    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            "MODEL:\n"
            "  MASK_ON: true\n"
            "  RESNETS:\n    STAGE_BLOCKS: [1, 1, 1, 1]\n"
            "  ROI_HEADS:\n    NUM_CLASSES: 1\n    BATCH_SIZE_PER_IMAGE: 16\n"
            "  RPN:\n    PRE_NMS_TOPK_TRAIN: 64\n    PRE_NMS_TOPK_TEST: 32\n"
            "    POST_NMS_TOPK_TRAIN: 64\n    POST_NMS_TOPK_TEST: 32\n"
            "INPUT:\n  MAX_GT: 8\n  GT_MASK_RES: 16\n  MIN_SIZE_TRAIN: [64]\n"
            "SOLVER:\n  IMS_PER_BATCH: 2\n  BASE_LR: 0.002\n  MAX_ITER: 80\n"
            "  CHECKPOINT_PERIOD: 20\n  WARMUP_ITERS: 0\n"
            "TEST:\n  EVAL_PERIOD: 0\n  DETECTIONS_PER_IMAGE: 8\n"
            f"OUTPUT_DIR: \"{out_dir}\"\n"
        )
    marker = str(tmp_path / "fault_fired")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the axon (TPU) PJRT plugin registers from sitecustomize whenever
    # PALLAS_AXON_POOL_IPS is set and then wins platform selection even
    # over JAX_PLATFORMS=cpu; subprocess children must really be CPU
    # (deterministic, synchronous checkpoint writes)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # corrupt every log window from iter 30 until the fail-fast fires
    env["UNMORE_FAULT_INJECT_AT"] = f"30:{marker}"
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "cad", "train_net.py"),
            "--config-file", cfg_path, "--canvas-size", "64",
            "--train-json", json_path, "--image-root", f"={img_dir}",
            "--train-workers", "1",
            "--max-restarts", "1",
        ],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert os.path.exists(marker), "fault never fired"
    # the corrupt window's periodic checkpoint was skipped, not written
    # (the clean post-resume process writes its own iter-40 checkpoint,
    # so the evidence is the skip message from the first process)
    assert "skipping checkpoint at iter 40" in out, out[-4000:]
    assert "FATAL: 2 consecutive corrupt loss windows" in out
    assert "supervisor: child died (corruption fail-fast)" in out
    # the restarted process resumed from the last healthy checkpoint...
    assert "resumed from" in out
    # ...and completed the full schedule
    assert os.path.isfile(os.path.join(out_dir, "model_0000080.ckpt")), os.listdir(out_dir)
    # training metrics continued past the injection point
    with open(os.path.join(out_dir, "metrics.json")) as f:
        iters = [json.loads(line)["iteration"] for line in f if line.strip()]
    assert max(iters) == 80
