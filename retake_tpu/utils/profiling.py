"""Per-phase timing hooks (the aux subsystem the reference lacks — SURVEY.md §5).

``StageTimer`` accumulates wall time per pipeline phase (vision, dpselect,
prefill chunks, decode, ...). Enabled via RETAKE_PROFILE=1 or explicitly.
When enabled, each stage boundary inserts a device fence: TPU runtimes execute
the per-device queue in order, so forcing a host read of a fresh scalar
flushes everything enqueued before it. (``block_until_ready`` does not
actually block under remote-tunnel backends, so fences are the only reliable
sync — see .claude/skills/verify/SKILL.md.)

For kernel-level traces use ``jax.profiler.trace`` around a run and inspect
with TensorBoard/XProf; StageTimer is the cheap always-available layer.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


def device_fence() -> None:
    """Force completion of all work enqueued on the default device."""
    import jax.numpy as jnp

    # fresh op -> fresh buffer; host read waits for in-order queue drain
    float(jnp.zeros(()) + time.monotonic_ns() % 97)


class StageTimer:
    def __init__(self, enabled: bool | None = None):
        self.enabled = (
            enabled
            if enabled is not None
            else os.environ.get("RETAKE_PROFILE", "") not in ("", "0")
        )
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        device_fence()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            device_fence()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        if not self.totals:
            return "(no stages recorded)"
        width = max(len(k) for k in self.totals)
        lines = [
            f"{k:<{width}}  {self.totals[k]:8.3f}s  x{self.counts[k]}"
            for k in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return "\n".join(lines)

    def report(self) -> None:
        if self.enabled:
            print("=== stage timing ===")
            print(self.summary())
