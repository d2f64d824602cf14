"""Profiling hooks: trace context writes a capture; stopwatch syncs."""

import jax.numpy as jnp

from oct_image_segmentation_models_tpu.common import profiling


def test_trace_context_writes_capture(tmp_path):
    prof_dir = tmp_path / "prof"
    with profiling.trace(prof_dir):
        x = jnp.arange(1024.0)
        (x * 2).sum().block_until_ready()
    # jax.profiler writes plugins/profile/<ts>/*.xplane.pb under the dir
    assert any(prof_dir.rglob("*.xplane.pb")), list(prof_dir.rglob("*"))

    # None -> no-op
    with profiling.trace(None):
        pass


def test_device_stopwatch_measures_after_sync():
    sw = profiling.DeviceStopwatch()
    x = jnp.arange(1 << 16, dtype=jnp.float32)
    sw.start()
    y = (x[None, :] * 2.0).sum()
    dt = sw.stop(y)
    assert dt >= 0.0
    assert float(y) == float(x.sum() * 2.0)
