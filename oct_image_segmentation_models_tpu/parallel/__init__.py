"""Device-mesh data parallelism (the TPU-native replacement for the
reference's ``tf.distribute.MirroredStrategy``,
`training/training.py:185-188`)."""

from .mesh import create_mesh, shard_batch  # noqa: F401
