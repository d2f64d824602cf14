"""Timeout-bounded backend probes for tunneled-TPU hosts.

On hosts where the accelerator sits behind an HTTP tunnel, the tunnel
drops for stretches and ``jax.devices()`` in an affected process then
either raises quickly or HANGS forever. Probing in a subprocess with a
hard timeout lets long-lived entry points (``bench.py``,
``__graft_entry__.dryrun_multichip``) learn the backend state without
risking their own first backend initialisation — shared here so the
two entry points cannot drift apart in how they classify outages.
"""

from __future__ import annotations

import subprocess
import sys

__all__ = ["probe_backend"]


def probe_backend(probe_timeout_s: float = 120.0) -> tuple[str, int]:
    """Classify the backend state from a fresh interpreter.

    Returns ``(mode, device_count)``:

    - ``("up", n)`` — the backend initialised and reported ``n`` devices;
      this process may safely initialise its own backend.
    - ``("error", 0)`` — initialisation failed fast; this process can
      proceed and surface the real backend exception.
    - ``("hang", 0)`` — initialisation blocked past the timeout; calling
      ``jax.devices()`` in this process would block indefinitely, so the
      caller must avoid backend init (abort, or re-exec on a virtual
      CPU platform).
    """
    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            timeout=probe_timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return "hang", 0
    if out.returncode != 0:
        return "error", 0
    try:
        return "up", int(out.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return "error", 0
