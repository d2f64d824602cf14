"""Process-pool helper for the jax-free per-image host phase.

The prediction/evaluation drivers run the device pipeline batched up
front; the remaining per-image work (metrics, HDF5/CSV writes,
matplotlib PNGs) is pure numpy/scipy/h5py and dominates wall-clock at
flagship scale (~2-4 s/image, reference shape
`evaluation/evaluation.py:108-446`). This module fans that phase out
over a spawn pool without letting worker processes near the (single,
possibly tunneled) accelerator.
"""

from __future__ import annotations

import os
from typing import Callable, List, Sequence


def pin_worker_to_cpu() -> None:
    """Spawn-pool initializer: keep worker-side JAX (if ever imported)
    off the accelerator. Runs before any task import executes. The
    config update covers environments whose sitecustomize overrides
    platform env vars (e.g. the axon TPU plugin)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def resolve_num_workers(num_workers) -> int:
    """Validated worker count for the host-side artifact pool.

    ``"auto"`` (the workflow default since r4) scales to the box:
    ``min(4, cpu_count - 1)`` — 0 (the serial reference-shaped loop) on
    1-2 core hosts where spawn startup (~1-2 s/worker) would eat the
    win, parallel on real multi-core hosts. The per-image phase is
    ~0.5-16 s/image at flagship scale (nearly all matplotlib PNGs +
    scipy EDT), embarrassingly parallel, and bitwise-identical to the
    serial path (tests/test_predict_evaluate.py), so the cap is about
    not oversubscribing hosts that also feed the device pipeline."""
    if num_workers == "auto":
        return max(0, min(4, (os.cpu_count() or 1) - 1))
    if not isinstance(num_workers, int) or isinstance(num_workers, bool) \
            or num_workers < 0:
        raise ValueError(
            f"num_workers must be an int >= 0 or 'auto', got {num_workers!r}"
        )
    return num_workers


def map_host_tasks(fn: Callable, tasks: Sequence, num_workers: int) -> List:
    """``[fn(t) for t in tasks]``, fanned over a spawn process pool when
    ``num_workers > 1``. ``fn`` must be a module-level (picklable)
    function doing jax-free work; results keep task order."""
    if num_workers > 1 and len(tasks) > 1:
        import multiprocessing

        workers = min(num_workers, len(tasks))
        with multiprocessing.get_context("spawn").Pool(
            workers, initializer=pin_worker_to_cpu
        ) as pool:
            return pool.map(fn, tasks)
    return [fn(task) for task in tasks]
