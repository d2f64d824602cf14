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
    (no-op when None).

    NB: on remote-tunnel transports (e.g. the axon HTTP tunnel used for
    bench development) ``jax.profiler`` traces are known to hang; prefer
    K-iteration in-jit timing there (see CLAUDE.md / tools/). A warning
    is logged so a hung epoch is attributable."""
    if profile_dir is None:
        yield
        return
    import logging

    logging.getLogger(__name__).warning(
        "starting jax.profiler trace into %s — on remote-tunnel TPU "
        "transports this is known to hang; unset profile_dir if the "
        "run stalls here",
        profile_dir,
    )
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
        if value is None:
            return
        for leaf in jax.tree_util.tree_leaves(value):
            # Slice ON DEVICE before the host read: np.asarray(leaf)
            # would transfer the whole buffer (tens of MB through a
            # tunnel), inflating the measured interval. Every leaf is
            # synced — on transports where dispatches don't pipeline,
            # one leaf's completion says nothing about the others'.
            arr = leaf
            if hasattr(arr, "ndim"):
                for _ in range(arr.ndim):
                    arr = arr[0]
            np.asarray(arr)

    def start(self, value=None):
        self._sync(value)
        self._t0 = time.perf_counter()

    def stop(self, value=None) -> float:
        self._sync(value)
        return time.perf_counter() - self._t0
