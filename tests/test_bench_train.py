"""Regression guard for tools/bench_train.py (BASELINE config #3).

The real measurement runs on the TPU; these tests keep the tool from
rotting: the TPU-side step builder must run end-to-end on CPU at tiny
shapes, and the reference-baseline cache key must track the measurement
source (the same auto-invalidation contract bench.py's inference
baseline has, ``bench._ref_baseline_key``).
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np

_TOOL = Path(__file__).resolve().parent.parent / "tools" / "bench_train.py"


def _load_tool():
    spec = importlib.util.spec_from_file_location("bench_train", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_train"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_tpu_train_measurement_runs_tiny_cpu():
    bt = _load_tool()
    tp = bt.measure_tpu_train(
        h=32, w=64, batch=2, num_classes=3, n_steps=2, start_neurons=4
    )
    assert np.isfinite(tp) and tp > 0


def test_train_baseline_key_tracks_measurement_source(monkeypatch):
    bt = _load_tool()
    key1 = bt._train_baseline_key()
    monkeypatch.setattr(bt, "TRAIN_BASELINE_VERSION", 2)
    key2 = bt._train_baseline_key()
    assert key1 != key2
    # and it is distinct from the inference baseline's key space
    import bench

    assert key1 != bench._ref_baseline_key(1)
