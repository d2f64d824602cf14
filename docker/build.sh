#!/bin/sh
# Build the TPU docker image (reference `docker/build.sh`).
cd "$(dirname "$0")/.." && docker build -f docker/Dockerfile -t oct-image-segmentation-models-tpu .
