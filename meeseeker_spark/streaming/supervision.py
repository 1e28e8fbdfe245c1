"""Control-flow supervision (SURVEY §2 E1/E2, B11).

- crash-restart with exponential backoff: the reference wraps its sync task
  in an infinite retry loop, backoff doubling 0.01 s → 30 s cap, reset on
  success (/root/reference/bin/meeseeker:25-33).
- admission gate: ingestion stalls one block-interval at a time while the
  live key count exceeds max_keys
  (/root/reference/lib/meeseeker/block_follower_job.rb:49-53).

Both are pure driver-side policies — injectable clock/sleep so they unit-
test without wall-clock time.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

from ..schemas import BLOCK_INTERVAL_S

T = TypeVar("T")


def run_with_restarts(fn: Callable[[], T], max_restarts: int | None = None,
                      base_backoff_s: float = 0.01, cap_s: float = 30.0,
                      sleep: Callable[[float], None] = time.sleep,
                      on_error: Callable[[BaseException, float], None] | None = None,
                      ) -> T:
    """Run fn until it returns; on exception sleep the current backoff and
    double it (capped). max_restarts=None → retry forever (the reference's
    daemon mode); bounded in tests."""
    backoff = base_backoff_s
    attempts = 0
    while True:
        try:
            return fn()
        # Exception, NOT BaseException (r12 review): the reference's
        # `rescue => e` is StandardError — KeyboardInterrupt/SystemExit
        # must kill the daemon, not be swallowed into a silent retry
        # (one Ctrl-C during fn() used to restart the sync loop)
        except Exception as e:  # noqa: BLE001 - supervision boundary
            attempts += 1
            if max_restarts is not None and attempts > max_restarts:
                raise
            if on_error:
                on_error(e, backoff)
            sleep(backoff)
            backoff = min(backoff * 2, cap_s)


def admission_gate(live_count: Callable[[], int], max_keys: int,
                   block_interval_s: float = BLOCK_INTERVAL_S,
                   sleep: Callable[[float], None] = time.sleep,
                   max_waits: int | None = None) -> int:
    """Block until the store drains below max_keys; returns waits performed.
    max_keys <= 0 disables the gate (reference: MEESEEKER_MAX_KEYS=-1)."""
    if max_keys <= 0:
        return 0
    waits = 0
    while live_count() > max_keys:
        if max_waits is not None and waits >= max_waits:
            break
        sleep(block_interval_s)
        waits += 1
    return waits
