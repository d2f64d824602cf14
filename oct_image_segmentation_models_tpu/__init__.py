"""TPU-native OCT image segmentation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
NIH-NEI/oct-image-segmentation-models (reference: Keras/TF 2.9, pure
Python). The public workflow API mirrors the reference
(`train_model`, `predict`, `evaluate_model` plus their parameter
objects — reference `training/training.py:135`,
`prediction/prediction.py:48`, `evaluation/evaluation.py:73`) while the
compute path is TPU-first:

- models are Flax modules jit-compiled by XLA (bf16 on the MXU),
- the Dijkstra "graph search" min-path post-process
  (reference `min_path_processing/graph_search.py`) is a vectorized
  on-device dynamic program (`ops.minpath`), batched over images and
  boundaries,
- probability-map -> boundary-map conversion
  (reference `common/utils.py:115-168`) is fused into the inference
  pipeline on device,
- data parallelism uses a `jax.sharding.Mesh` + `shard_map` with
  `psum` gradient reduction instead of `tf.distribute.MirroredStrategy`
  (reference `training/training.py:185-188`).
"""

__version__ = "0.1.0"

import os as _os

# Parity with reference `__init__.py:11-20`: force the non-interactive
# matplotlib backend (workflows save PNGs headlessly; the default backend
# leaks memory across figures) and drop a conflicting TCL_LIBRARY.
try:
    import matplotlib as _matplotlib

    _matplotlib.use("Agg")
except ImportError:
    pass

if _os.environ.get("TCL_LIBRARY"):
    del _os.environ["TCL_LIBRARY"]
