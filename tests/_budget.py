"""Trial budget for randomized multi-trial tests (r15, VERDICT r14 #1).

The default ``pytest tests/ -x -q`` run must finish inside the driver's
verify window, so randomized loop tests run a reduced trial count by
default and the full count when ``ASTRO_TEST_TRIALS=full`` is set (the
slow tier kept for local deep runs).  Every trial is deterministic
(seeded RNGs), so the low tier always replays the SAME trials — less
coverage, never flakiness.
"""

from __future__ import annotations

import os


def full_tier() -> bool:
    return os.environ.get("ASTRO_TEST_TRIALS", "").lower() == "full"


def trials(low: int, full: int) -> int:
    """Trial count: ``low`` by default, ``full`` under the slow tier."""
    return full if full_tier() else low
