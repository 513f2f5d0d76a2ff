"""Bounded-restart supervisor for long unattended training runs.

Completes the fail-fast recovery contract of
:mod:`unmore_tpu.train.resilience`: when a trainer detects persistent
device corruption it exits with :data:`FATAL_EXIT_CODE` *without*
saving, expecting to be relaunched with ``--resume`` from the last
periodic checkpoint in a fresh process (a fresh process means a fresh
device channel, which is what clears the corruption on this relay —
STATUS.md round-3 post-mortem). Spontaneous TPU-worker crashes
(nonzero exits, signals) get the same treatment.

The trainer CLIs embed this via ``--max-restarts N``: the launched
process becomes a small supervisor that re-invokes itself with
``--max-restarts 0`` plus the resume flag, restarting on any retryable
exit up to N times. The reference has no analog — its recovery story
is "restart from periodic checkpoint by hand" (SURVEY.md §5).
"""

from __future__ import annotations

import subprocess
import sys
import threading
import time
from typing import Callable, Sequence

from unmore_tpu.train.resilience import FATAL_EXIT_CODE

# argparse's own exit code for bad flags: retrying can never fix it
_USAGE_ERROR = 2


def _cpu_seconds(pid: int) -> float | None:
    """Cumulative user+system CPU seconds of ``pid`` (Linux /proc).

    Returns None when unreadable (non-Linux, or the process exited) —
    callers must then skip busy-hang detection for that sample.
    """
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            fields = f.read().rsplit(b")", 1)[1].split()
        # fields are those after comm: state is [0], utime [11], stime [12]
        ticks = int(fields[11]) + int(fields[12])
        return ticks / 100.0  # USER_HZ is 100 on every Linux this runs on
    except (OSError, IndexError, ValueError):
        return None


def retryable(returncode: int) -> bool:
    """Should the supervisor relaunch after this child exit?

    * 0 — clean finish, done.
    * 2 — argparse usage error; deterministic, never retry.
    * FATAL_EXIT_CODE (3) — corruption fail-fast, the designed restart.
    * anything else (crashes, signals, OOM kills) — retry too: TPU
      worker crashes mid-run surface as arbitrary nonzero exits.
    """
    return returncode not in (0, _USAGE_ERROR)


def _run_with_watchdog(
    argv: Sequence[str],
    hang_timeout: float,
    log: Callable[[str], None],
    busy_hang_timeout: float | None = None,
) -> tuple[int, bool]:
    """Run the child with its stdout piped through us, killing it when
    no output arrives for ``hang_timeout`` seconds.

    A relay-wedge hang (the channel stalls mid-call; the child blocks
    forever inside a device op without exiting — STATUS.md round-4
    incident) never trips the exit-code path, so a supervisor that only
    watches exits leaves an unattended run dead in the water. Output
    is the liveness signal: the trainers print every log window, and
    the longest *legitimate* silence is a cold remote compile.

    ``busy_hang_timeout`` (seconds, < hang_timeout) kills a *busy*
    silent child early: the round-4 wedge burned ~90% CPU while silent
    (the relay client spins), whereas the long legitimate silences —
    remote compiles — block on the network at ~0% CPU. A child that is
    both silent past busy_hang_timeout and has used >25% of a core over
    that silent window cannot be compiling; it is wedged (the threshold
    is low because a wedged spinner on a contended host may only get a
    fraction of a core). Supervised
    trainers print every log window (<1 min apart), so the early kill
    has an order-of-magnitude margin over legitimate inter-output work.
    Returns (returncode, hung).
    """
    proc = subprocess.Popen(
        list(argv), stdout=subprocess.PIPE, stderr=subprocess.STDOUT
    )
    last_output = [time.monotonic()]

    def pump() -> None:
        assert proc.stdout is not None
        for raw in proc.stdout:
            last_output[0] = time.monotonic()
            sys.stdout.buffer.write(raw)
            sys.stdout.buffer.flush()

    reader = threading.Thread(target=pump, daemon=True)
    reader.start()
    hung = False
    # CPU accounting for the busy-wedge heuristic: snapshot at the
    # start of every silent window, compare when the window exceeds
    # busy_hang_timeout.
    silent_anchor = last_output[0]
    cpu_anchor = _cpu_seconds(proc.pid)

    def _kill(why: str) -> int:
        log(why)
        proc.terminate()
        try:
            return proc.wait(timeout=30.0)
        except subprocess.TimeoutExpired:
            proc.kill()
            return proc.wait()

    while True:
        try:
            rc = proc.wait(timeout=5.0)
            break
        except subprocess.TimeoutExpired:
            now = time.monotonic()
            silent_for = now - last_output[0]
            if last_output[0] != silent_anchor:
                # output arrived since the anchor: restart the window
                silent_anchor = last_output[0]
                cpu_anchor = _cpu_seconds(proc.pid)
            if silent_for > hang_timeout:
                hung = True
                rc = _kill(
                    f"supervisor: no child output for {hang_timeout:.0f}s; "
                    "killing hung child"
                )
                break
            if (
                busy_hang_timeout is not None
                and silent_for > busy_hang_timeout
                and cpu_anchor is not None
            ):
                cpu_now = _cpu_seconds(proc.pid)
                if (
                    cpu_now is not None
                    and (cpu_now - cpu_anchor) / silent_for > 0.25
                ):
                    hung = True
                    rc = _kill(
                        "supervisor: child silent "
                        f"{silent_for:.0f}s while burning "
                        f"{(cpu_now - cpu_anchor) / silent_for:.0%} CPU "
                        "(relay wedge, not a compile); killing hung child"
                    )
                    break
    reader.join(timeout=5.0)
    return rc, hung


def supervise(
    build_argv: Callable[[int], Sequence[str]],
    max_restarts: int,
    restart_delay: float = 2.0,
    log: Callable[[str], None] = lambda msg: print(msg, flush=True),
    hang_timeout: float | None = None,
    busy_hang_timeout: float | None = None,
) -> int:
    """Run ``build_argv(attempt)`` as a subprocess with bounded restarts.

    ``build_argv`` receives the attempt number (0 = first launch) and
    returns the full argv; attempts > 0 should include the resume flag
    pointing at the newest checkpoint. Returns the final exit code
    (0 on success, the child's last code when restarts are exhausted).

    With ``hang_timeout`` (seconds), child stdout is piped through the
    supervisor and a child that prints nothing for that long is killed
    and restarted like any crash (see :func:`_run_with_watchdog`).
    """
    attempt = 0
    while True:
        argv = list(build_argv(attempt))
        if attempt:
            log(f"supervisor: restart {attempt}/{max_restarts}: {' '.join(argv)}")
        if hang_timeout is not None:
            rc, hung = _run_with_watchdog(
                argv, hang_timeout, log, busy_hang_timeout=busy_hang_timeout
            )
        else:
            rc, hung = subprocess.run(argv).returncode, False
        if not hung and not retryable(rc):
            if rc:
                log(f"supervisor: non-retryable exit {rc}")
            return rc
        why = (
            "hang (no output)"
            if hung
            else "corruption fail-fast"
            if rc == FATAL_EXIT_CODE
            else f"exit {rc}"
        )
        if attempt >= max_restarts:
            log(f"supervisor: {why}, restart budget ({max_restarts}) exhausted")
            return rc
        attempt += 1
        log(f"supervisor: child died ({why}); relaunching in {restart_delay:.0f}s")
        time.sleep(restart_delay)


def strip_flag(argv: Sequence[str], flag: str, has_value: bool) -> list[str]:
    """Remove ``flag`` (and its value for ``has_value``) from argv.
    Handles both ``--flag value`` and ``--flag=value`` spellings."""
    out: list[str] = []
    skip = False
    for a in argv:
        if skip:
            skip = False
            continue
        if a == flag:
            skip = has_value
            continue
        if has_value and a.startswith(flag + "="):
            continue
        out.append(a)
    return out


def child_argv(script: str, argv: Sequence[str], max_restarts_flag: str) -> list[str]:
    """Base child command: this interpreter + script + argv with the
    supervisor flag removed (the child must run single-shot)."""
    return [sys.executable, script, *strip_flag(argv, max_restarts_flag, True)]
