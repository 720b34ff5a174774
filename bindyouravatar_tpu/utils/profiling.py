"""Profiling / tracing hooks (the reference has none — SURVEY §5 requires
them as a first-class feature of the rebuild).

`trace(dir)` wraps a region in a jax.profiler trace (viewable in
TensorBoard / Perfetto); `timed` collects named wall-clock phases with the
relay-safe sync (scalar fetch — `block_until_ready` is a no-op under the
axon tunnel, see bench.py).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x) -> None:
    """Force completion of a device value (fetch one scalar)."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf))


class PhaseTimer:
    """Named phase timing; `report()` -> dict of seconds."""

    def __init__(self):
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_value: Optional[Any] = None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            v = holder.get("value", sync_value)
            if v is not None:
                sync(v)
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> Dict[str, float]:
        return dict(self.phases)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)
