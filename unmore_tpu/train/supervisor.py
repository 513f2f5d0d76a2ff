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
import time
from typing import Callable, Sequence

from unmore_tpu.train.resilience import FATAL_EXIT_CODE

# argparse's own exit code for bad flags: retrying can never fix it
_USAGE_ERROR = 2


def retryable(returncode: int) -> bool:
    """Should the supervisor relaunch after this child exit?

    * 0 — clean finish, done.
    * 2 — argparse usage error; deterministic, never retry.
    * FATAL_EXIT_CODE (3) — corruption fail-fast, the designed restart.
    * anything else (crashes, signals, OOM kills) — retry too: TPU
      worker crashes mid-run surface as arbitrary nonzero exits.
    """
    return returncode not in (0, _USAGE_ERROR)


def supervise(
    build_argv: Callable[[int], Sequence[str]],
    max_restarts: int,
    restart_delay: float = 2.0,
    log: Callable[[str], None] = lambda msg: print(msg, flush=True),
) -> int:
    """Run ``build_argv(attempt)`` as a subprocess with bounded restarts.

    ``build_argv`` receives the attempt number (0 = first launch) and
    returns the full argv; attempts > 0 should include the resume flag
    pointing at the newest checkpoint. Returns the final exit code
    (0 on success, the child's last code when restarts are exhausted).
    """
    attempt = 0
    while True:
        argv = list(build_argv(attempt))
        if attempt:
            log(f"supervisor: restart {attempt}/{max_restarts}: {' '.join(argv)}")
        proc = subprocess.run(argv)
        rc = proc.returncode
        if not retryable(rc):
            if rc:
                log(f"supervisor: non-retryable exit {rc}")
            return rc
        why = "corruption fail-fast" if rc == FATAL_EXIT_CODE else f"exit {rc}"
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
