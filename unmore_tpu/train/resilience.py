"""Silent-corruption detection for long training runs.

On this image's TPU relay, device state silently corrupts after
~35-50 min of sustained traffic (STATUS.md round-3 post-mortem): every
subsequent batch computes the same huge loss, and neither the
device-resident weights nor a checkpoint pulled after onset can be
trusted. The recovery contract is: detect fast, exit WITHOUT saving,
and let a retry supervisor (``unmore_tpu.train.supervisor``, or the
``--max-restarts`` flag on the trainer CLIs) resume from the last
periodic checkpoint in a fresh process (fresh device channel).

Both trainer CLIs share this window-level detector; the step-level
guards (stage-1 spike-skip, CAD NaN-skip) handle isolated bad batches.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

FATAL_EXIT_CODE = 3  # retry wrappers key on this


@dataclasses.dataclass
class CorruptionDetector:
    """Counts consecutive "corrupt" log windows; fatal at ``threshold``.

    A single bad window (one spike, one skipped batch burst) resets on
    the next healthy one; persistence is what distinguishes device
    corruption from a stray batch.
    """

    threshold: int = 2
    consecutive: int = 0

    def update(self, window_is_corrupt: bool) -> bool:
        """Record one log window; returns True when the run is fatal."""
        self.consecutive = self.consecutive + 1 if window_is_corrupt else 0
        return self.consecutive >= self.threshold

    @property
    def last_window_corrupt(self) -> bool:
        """True when the most recent window looked corrupt. Checkpoints
        written now would snapshot already-suspect state — callers skip
        the save until a healthy window resets the counter."""
        return self.consecutive > 0

    @staticmethod
    def loss_window_corrupt(
        total_loss: float, ceiling: float = 1e3, in_warmup: bool = False
    ) -> bool:
        """Is this window's loss consistent with device corruption?

        Non-finite losses always count. A finite-but-large loss counts
        only after warmup: early-training losses under LR warmup can
        legitimately sit above any fixed ceiling, while the observed
        corruption mode (STATUS.md) produces values orders of magnitude
        beyond it mid-run — not at step 1.
        """
        if not np.isfinite(total_loss):
            return True
        return (not in_warmup) and total_loss > ceiling


# --------------------------------------------------------- fault injection
#
# Deliberate corruption-for-testing: the retry-supervisor contract
# ("exit(3) without saving, wrapper resumes from the last checkpoint")
# is only trustworthy if an injected fault actually travels that path
# end-to-end. When UNMORE_FAULT_INJECT_AT="<iter>:<marker_path>" is set,
# the trainers treat every log window at or past <iter> as corrupt
# until <marker_path> exists; the trainer writes the marker right
# before the fatal exit, so the restarted process trains cleanly.


def _injection_spec() -> tuple[int, str] | None:
    spec = os.environ.get("UNMORE_FAULT_INJECT_AT")
    if not spec:
        return None
    at, _, marker = spec.partition(":")
    if not marker:
        raise ValueError(
            f"UNMORE_FAULT_INJECT_AT must be '<iter>:<marker_path>', got {spec!r}"
        )
    return int(at), marker


def fault_injection_active(step: int) -> bool:
    """True when a test-injected fault should corrupt this window."""
    spec = _injection_spec()
    if spec is None:
        return False
    at, marker = spec
    return step >= at and not os.path.exists(marker)


def mark_fault_injected() -> None:
    """Record that the injected fault fired (restarted runs skip it)."""
    spec = _injection_spec()
    if spec is not None:
        with open(spec[1], "w") as f:
            f.write("injected\n")
