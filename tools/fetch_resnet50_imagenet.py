#!/usr/bin/env python
"""Fetch the Keras ResNet50 ImageNet weights for DeepLabV3+ pretraining.

The reference obtains these implicitly through
``keras.applications.ResNet50(weights="imagenet", include_top=False)``
(`/root/reference/oct_image_segmentation_models/models/deeplabv3plus.py:91-95`).
This framework takes the same weights as an explicit file: pass the
downloaded path as ``model_hyperparameters={"pretrained_weights": ...}``
(see ``models/deeplabv3plus.py:156`` and the import in
``common/model_io.py:257``).

Requires network egress (run at deployment, not in the air-gapped build
environment). The URL and MD5 checksum below are the exact ones Keras's
own downloader uses (``keras.src.applications.resnet.BASE_WEIGHTS_PATH``
/ ``WEIGHTS_HASHES["resnet50"][1]`` — the *notop* variant, which is what
``include_top=False`` fetches).

Usage:
    python tools/fetch_resnet50_imagenet.py [dest.h5]

Verify an already-downloaded file without fetching:
    python tools/fetch_resnet50_imagenet.py --verify path/to/file.h5
"""

from __future__ import annotations

import hashlib
import os
import sys
import tempfile
import urllib.request
from pathlib import Path

URL = (
    "https://storage.googleapis.com/tensorflow/keras-applications/resnet/"
    "resnet50_weights_tf_dim_ordering_tf_kernels_notop.h5"
)
# Keras WEIGHTS_HASHES["resnet50"][1] (notop); MD5 of the full file.
MD5 = "4d473c1dd8becc155b73f8504c6f6626"
DEFAULT_DEST = "resnet50_imagenet_notop.h5"


def md5_of(path: Path) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def verify(path: Path, display_name=None) -> None:
    digest = md5_of(path)
    if digest != MD5:
        sys.exit(
            f"CHECKSUM MISMATCH for {display_name or path}: got md5 "
            f"{digest}, expected {MD5} — re-download (a partial download "
            "is discarded automatically)"
        )
    print(f"OK: {display_name or path} md5={digest}")


def fetch(dest: Path) -> None:
    if dest.exists():
        print(f"{dest} already exists; verifying only")
        verify(dest)
        return
    print(f"Downloading {URL}\n  -> {dest}")
    fd, tmp_name = tempfile.mkstemp(dir=dest.parent, suffix=".part")
    os.close(fd)
    tmp = Path(tmp_name)
    try:
        urllib.request.urlretrieve(URL, tmp)  # nosec: pinned https URL
        verify(tmp, display_name=dest)
        tmp.replace(dest)
    finally:
        tmp.unlink(missing_ok=True)
    print(
        "Use it via TrainingParams(model_hyperparameters="
        f"{{'pretrained_weights': '{dest}'}}) or "
        f"DeepLabV3Plus(pretrained_weights='{dest}', ...)"
    )


def main(argv):
    if argv[:1] == ["--verify"]:
        if len(argv) != 2:
            sys.exit("usage: fetch_resnet50_imagenet.py --verify file.h5")
        verify(Path(argv[1]))
        return
    dest = Path(argv[0]) if argv else Path(DEFAULT_DEST)
    fetch(dest)


if __name__ == "__main__":
    main(sys.argv[1:])
