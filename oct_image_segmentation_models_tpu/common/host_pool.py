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
