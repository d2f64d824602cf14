"""TPU compute kernels: boundary-map conversion, min-path DP, losses,
metrics, and augmentations — all pure JAX (jit/vmap/lax.scan, Pallas for
the hot min-path kernel)."""
