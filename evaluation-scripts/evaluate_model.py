#!/usr/bin/env python
"""Evaluate a trained model on a test HDF5 dataset.

Working replacement for the reference's stale script
(`evaluation-scripts/evaluate_model.py` imports modules that do not exist,
reference `:11-14`), keeping its documented invocation shape
(`README.md:61-73`):

    python evaluate_model.py <model-file> <test-dataset.hdf5> <output-dir>
"""

import sys

from oct_image_segmentation_models_tpu.cli import main

if __name__ == "__main__":
    model, dataset, output_dir = sys.argv[1:4]
    sys.exit(main(["evaluate", model, dataset, output_dir, *sys.argv[4:]]))
