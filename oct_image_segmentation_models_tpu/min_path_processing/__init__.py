"""Min-path ("graph search") boundary delineation, public API parity with
reference `min_path_processing/` — the compute runs on TPU
(:mod:`..ops.minpath`)."""

from .utils import generate_boundary  # noqa: F401
