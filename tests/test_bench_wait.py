"""Unit tests for bench.py's tunnel-outage wait state machine.

The axon tunnel drops for stretches; ``jax.devices()`` then either
raises quickly or hangs forever (PLAN.md environment gotchas). The
driver runs ``bench.py`` unattended, so ``wait_for_accelerator`` must
distinguish the two failure modes: after the wait budget, "error" lets
the caller proceed and fail fast with the real backend error, while
"hang" tells it to abort (initialising the backend in-process would
block indefinitely). Probes run in subprocesses; these tests fake
``subprocess.call`` and the clock to drive each mode instantly.
"""

import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


class _FakeTime:
    """Deterministic stand-in for the ``time`` module: ``sleep``
    advances the clock instead of blocking, and each ``time()`` call
    ticks a little so deadline checks always make progress."""

    def __init__(self):
        self.now = 1000.0
        self.slept = []

    def time(self):
        self.now += 0.1
        return self.now

    def sleep(self, s):
        self.slept.append(s)
        self.now += s


def _fake_call(script):
    """subprocess.call replacement playing back a list of outcomes
    ('ok', 'fail', 'hang'); the last outcome repeats forever."""
    outcomes = list(script)

    def call(cmd, timeout=None, **kwargs):
        outcome = outcomes.pop(0) if len(outcomes) > 1 else outcomes[0]
        if outcome == "hang":
            raise subprocess.TimeoutExpired(cmd, timeout)
        return 0 if outcome == "ok" else 1

    return call


def _patched(monkeypatch, script):
    fake_time = _FakeTime()
    monkeypatch.setattr(bench, "time", fake_time)
    monkeypatch.setattr(subprocess, "call", _fake_call(script))
    return fake_time


def test_wait_returns_up_on_first_success(monkeypatch):
    _patched(monkeypatch, ["ok"])
    assert bench.wait_for_accelerator(max_wait_s=5) == "up"


def test_wait_recovers_mid_outage(monkeypatch):
    """A probe succeeding after failures still reports "up" (the bench
    then proceeds normally — this is the common ride-it-out case)."""
    fake_time = _patched(monkeypatch, ["fail", "hang", "ok"])
    assert bench.wait_for_accelerator(max_wait_s=900) == "up"
    assert len(fake_time.slept) == 2  # retried after each failure


def test_wait_reports_error_mode_after_deadline(monkeypatch):
    """Fast-raising probes end in "error": the caller may initialise
    its own backend and surface the real exception."""
    _patched(monkeypatch, ["fail"])
    assert bench.wait_for_accelerator(max_wait_s=0) == "error"


def test_wait_reports_hang_mode_after_deadline(monkeypatch):
    """Timed-out probes end in "hang": the caller must NOT initialise
    the backend in-process (it would block forever) — bench.main exits
    with a diagnostic instead (verified live during a real outage)."""
    _patched(monkeypatch, ["hang"])
    assert bench.wait_for_accelerator(max_wait_s=0) == "hang"


def test_wait_last_probe_mode_wins(monkeypatch):
    """The reported mode reflects the most recent probe, not the first:
    an outage that degrades from erroring to hanging must be treated as
    hanging."""
    _patched(monkeypatch, ["fail", "hang"])
    assert bench.wait_for_accelerator(max_wait_s=40) == "hang"


def test_wait_retry_sleep_is_clamped(monkeypatch):
    """The retry sleep never exceeds 30 s or (approximately) the
    remaining budget, so the wait honors ``max_wait_s`` instead of
    overshooting short waits by a whole retry period."""
    fake_time = _patched(monkeypatch, ["fail"])
    bench.wait_for_accelerator(max_wait_s=100)
    assert fake_time.slept, "expected at least one retry sleep"
    assert all(s <= 30 for s in fake_time.slept)
    # the fake clock shows the total wall time stayed near the budget
    assert fake_time.now - 1000.0 < 100 + 30
