"""Profiling / tracing hooks.

The reference's only observability is coarse wall-clock timers persisted
as HDF5 attrs (reference `prediction/prediction.py:74-159`,
`training/training_callbacks.py:46-54`) — those are kept. This module
adds the TPU-native layer: ``jax.profiler`` traces (viewable in
TensorBoard / Perfetto) around training steps or inference pipelines, and
a device-time stopwatch that is robust to async dispatch.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(profile_dir: Optional[Path]):
    """Context manager: capture a jax.profiler trace into ``profile_dir``
    (no-op when None)."""
    if profile_dir is None:
        yield
        return
    profile_dir = Path(profile_dir)
    profile_dir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(profile_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class DeviceStopwatch:
    """Wall-clock stopwatch that forces a real device sync at each mark
    (a tiny host readback — ``block_until_ready`` can be unreliable on
    tunneled backends)."""

    def __init__(self):
        self._t0 = None

    @staticmethod
    def _sync(value):
        if value is not None:
            leaf = jax.tree_util.tree_leaves(value)
            if leaf:
                np.asarray(leaf[0]).ravel()[:1]

    def start(self, value=None):
        self._sync(value)
        self._t0 = time.perf_counter()

    def stop(self, value=None) -> float:
        self._sync(value)
        return time.perf_counter() - self._t0
