#!/usr/bin/env python
"""BASELINE config #5: streaming volume inference throughput.

Segments a 512-B-scan uint8 volume (512x1024) through VolumeSegmenter
(fused conv -> softmax -> boundary-map -> min-path pipeline, double-
buffered host->device prefetch) and reports end-to-end B-scans/s
INCLUDING host transfers — the serving number, vs bench.py's pure
device-compute number.

Usage: python tools/bench_volume.py [n_bscans] [tie_parity]
"""

from __future__ import annotations

import sys
import time

import numpy as np

H, W, BATCH, NUM_CLASSES = 512, 1024, 8, 4


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    tie = sys.argv[2] if len(sys.argv) > 2 else "fast"

    import jax

    from oct_image_segmentation_models_tpu.models import get_model_class
    from oct_image_segmentation_models_tpu.common.model_io import LoadedModel
    from oct_image_segmentation_models_tpu.prediction.streaming import (
        VolumeSegmenter,
    )

    container = get_model_class("unet")(
        input_channels=1,
        num_classes=NUM_CLASSES,
        image_height=H,
        image_width=W,
        start_neurons=32,
    )
    module = container.build_model()
    variables = module.init(
        jax.random.PRNGKey(0), np.zeros((1, H, W, 1), np.float32),
        training=False,
    )
    loaded = LoadedModel(
        name="unet",
        module=module,
        variables=dict(variables),
        model_config=container.get_config(),
    )
    seg = VolumeSegmenter(
        loaded,
        container.get_config(),
        batch_size=BATCH,
        minpath_tie_parity=tie,
    )

    rng = np.random.default_rng(0)
    volume = rng.integers(0, 255, (n, H, W, 1), dtype=np.uint8)

    # warmup (compile) on a small prefix
    seg.segment_volume(volume[: 2 * BATCH])

    t0 = time.perf_counter()
    labels, segs = seg.segment_volume(volume)
    dt = time.perf_counter() - t0
    assert labels.shape[0] == n and segs.shape[0] == n
    print(
        f"streaming volume: {n} B-scans in {dt:.2f} s = {n / dt:.1f} "
        f"B-scans/s end-to-end (tie_parity={tie}, batch {BATCH}, "
        f"incl. host<->device transfers)"
    )


if __name__ == "__main__":
    main()
