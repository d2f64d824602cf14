#!/bin/sh
# Build the wheel (reference `build.sh:1-3`).
python -m build
