"""Silent-corruption detection for long training runs.

On this image's TPU relay, device state silently corrupts after
~35-50 min of sustained traffic (STATUS.md round-3 post-mortem): every
subsequent batch computes the same huge loss, and neither the
device-resident weights nor a checkpoint pulled after onset can be
trusted. The recovery contract is: detect fast, exit WITHOUT saving,
and let a retry wrapper resume from the last periodic checkpoint in a
fresh process (fresh device channel).

Both trainer CLIs share this window-level detector; the step-level
guards (stage-1 spike-skip, CAD NaN-skip) handle isolated bad batches.
"""

from __future__ import annotations

import dataclasses

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

    @staticmethod
    def loss_window_corrupt(total_loss: float, ceiling: float = 1e3) -> bool:
        return not np.isfinite(total_loss) or total_loss > ceiling
