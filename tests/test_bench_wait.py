"""Unit tests for the tunnel-outage handling in the driver entry points.

The axon tunnel drops for stretches; ``jax.devices()`` then either
raises quickly or hangs forever (PLAN.md environment gotchas). The
driver runs ``bench.py`` and ``__graft_entry__.dryrun_multichip``
unattended, so both classify the backend through one shared probe
(``common.tunnel.probe_backend``) before risking their own backend
init: "error" lets a caller proceed and fail fast with the real
backend exception, while "hang" means in-process init would block
indefinitely. These tests fake the probe subprocess and the clock to
drive each mode instantly.
"""

import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__  # noqa: E402
import bench  # noqa: E402
from oct_image_segmentation_models_tpu.common import tunnel  # noqa: E402


# ---------------------------------------------------------------------------
# common.tunnel.probe_backend — the shared probe itself
# ---------------------------------------------------------------------------


class _Run:
    def __init__(self, returncode=0, stdout=""):
        self.returncode = returncode
        self.stdout = stdout


def test_probe_up_reports_device_count(monkeypatch):
    monkeypatch.setattr(
        subprocess, "run", lambda *a, **k: _Run(0, "some log line\n8\n")
    )
    assert tunnel.probe_backend() == ("up", 8)


def test_probe_error_on_nonzero_exit(monkeypatch):
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Run(1, ""))
    assert tunnel.probe_backend() == ("error", 0)


def test_probe_error_on_garbled_output(monkeypatch):
    """rc=0 with unparseable output (e.g. a plugin printing banners and
    swallowing the count) is an error, not a crash."""
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Run(0, "banner"))
    assert tunnel.probe_backend() == ("error", 0)
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Run(0, ""))
    assert tunnel.probe_backend() == ("error", 0)


def test_probe_hang_on_timeout(monkeypatch):
    def run(cmd, timeout=None, **kwargs):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", run)
    assert tunnel.probe_backend() == ("hang", 0)


# ---------------------------------------------------------------------------
# bench.wait_for_accelerator — the retry state machine
# ---------------------------------------------------------------------------


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


def _fake_probe(script):
    """probe_backend replacement playing back a list of modes
    ('up', 'error', 'hang'); the last mode repeats forever."""
    modes = list(script)

    def probe(probe_timeout_s=120.0):
        mode = modes.pop(0) if len(modes) > 1 else modes[0]
        return mode, (1 if mode == "up" else 0)

    return probe


def _patched(monkeypatch, script):
    fake_time = _FakeTime()
    monkeypatch.setattr(bench, "time", fake_time)
    monkeypatch.setattr(bench, "probe_backend", _fake_probe(script))
    return fake_time


def test_wait_returns_up_on_first_success(monkeypatch):
    _patched(monkeypatch, ["up"])
    assert bench.wait_for_accelerator(max_wait_s=5) == "up"


def test_wait_recovers_mid_outage(monkeypatch):
    """A probe succeeding after failures still reports "up" (the bench
    then proceeds normally — this is the common ride-it-out case)."""
    fake_time = _patched(monkeypatch, ["error", "hang", "up"])
    assert bench.wait_for_accelerator(max_wait_s=900) == "up"
    assert len(fake_time.slept) == 2  # retried after each failure


def test_wait_reports_error_mode_after_deadline(monkeypatch):
    """Fast-raising probes end in "error": the caller may initialise
    its own backend and surface the real exception."""
    _patched(monkeypatch, ["error"])
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
    _patched(monkeypatch, ["error", "hang"])
    assert bench.wait_for_accelerator(max_wait_s=40) == "hang"


def test_wait_retry_sleep_is_clamped(monkeypatch):
    """The retry sleep never exceeds 30 s or (approximately) the
    remaining budget, so the wait honors ``max_wait_s`` instead of
    overshooting short waits by a whole retry period."""
    fake_time = _patched(monkeypatch, ["error"])
    bench.wait_for_accelerator(max_wait_s=100)
    assert fake_time.slept, "expected at least one retry sleep"
    assert all(s <= 30 for s in fake_time.slept)
    # the fake clock shows the total wall time stayed near the budget
    assert fake_time.now - 1000.0 < 100 + 30


# ---------------------------------------------------------------------------
# __graft_entry__ dryrun bootstrap pieces
# ---------------------------------------------------------------------------


def test_virtual_cpu_env_replaces_stale_device_count():
    """An inherited smaller count would silently cap the mesh and fail
    the n-device assertion in _dryrun_body."""
    env = __graft_entry__._virtual_cpu_env(
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=2 --foo=bar"},
        8,
        "/root/repo",
    )
    assert env["XLA_FLAGS"].count("xla_force_host_platform_device_count") == 1
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "--foo=bar" in env["XLA_FLAGS"]  # unrelated flags survive


def test_virtual_cpu_env_pythonpath_and_marker():
    """The re-exec env must carry the repo root AND the axon plugin
    site (CLAUDE.md: clobbering the latter breaks jax.devices()), plus
    the re-exec marker that prevents infinite bootstrap recursion."""
    import os

    env = __graft_entry__._virtual_cpu_env(
        {"PYTHONPATH": "/custom"}, 8, "/root/repo"
    )
    parts = env["PYTHONPATH"].split(os.pathsep)
    assert parts[0] == "/root/repo"
    assert "/root/.axon_site" in parts
    assert "/custom" in parts
    assert env["_GRAFT_DRYRUN_REEXEC"] == "1"


def test_virtual_cpu_env_does_not_mutate_caller():
    original = {"XLA_FLAGS": "--foo=bar"}
    __graft_entry__._virtual_cpu_env(original, 8, "/root/repo")
    assert original == {"XLA_FLAGS": "--foo=bar"}


def test_dryrun_runs_body_inline_when_enough_real_devices(monkeypatch):
    """With enough answering real devices the body runs in-process (no
    re-exec), preserving the parent platform for later entry()/bench."""
    calls = []
    monkeypatch.setattr(
        __graft_entry__, "_dryrun_body", lambda n: calls.append(n)
    )
    monkeypatch.setattr(
        tunnel, "probe_backend", lambda *a, **k: ("up", 8)
    )
    __graft_entry__.dryrun_multichip(8)
    assert calls == [8]


def test_dryrun_reexecs_on_hang(monkeypatch):
    """During a tunnel outage (probe hangs) the dryrun must NOT init
    the backend in-process; it re-execs on the virtual CPU platform."""
    execs = []
    monkeypatch.setattr(
        __graft_entry__, "_dryrun_body", lambda n: (_ for _ in ()).throw(
            AssertionError("body must not run in-process during an outage")
        )
    )
    monkeypatch.setattr(tunnel, "probe_backend", lambda *a, **k: ("hang", 0))

    def fake_run(cmd, env=None, cwd=None, check=None):
        execs.append((cmd, env))

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    __graft_entry__.dryrun_multichip(8)
    (cmd, env), = execs
    assert "_dryrun_body(8)" in cmd[-1]
    assert env["_GRAFT_DRYRUN_REEXEC"] == "1"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
