"""Misc host-side utilities — reference `common/utils.py`.

The array transforms delegate to the batched on-device implementations in
:mod:`..ops.boundary`; these wrappers keep the reference's NumPy-facing
call shapes for drop-in compatibility.
"""

from __future__ import annotations

import datetime
import hashlib
import logging as log
from pathlib import Path

import numpy as np

from ..ops import boundary as boundary_ops


def get_timestamp() -> str:
    """Reference `common/utils.py:19-23`."""
    return datetime.datetime.now().strftime("%Y-%m-%d_%H_%M_%S")


def convert_maps_uint8(prob_maps):
    """Reference `common/utils.py:73-77`."""
    return (np.asarray(prob_maps) * 255).astype("uint8")


def perform_argmax(predictions, bin=True):
    """Reference `common/utils.py:80-112` (channels-last input)."""
    argmax_pred, categorical_pred = boundary_ops.perform_argmax(
        np.asarray(predictions), bin=bin
    )
    return [np.asarray(argmax_pred), np.asarray(categorical_pred)]


def convert_predictions_to_maps_semantic(categorical_pred, bg_ilm=True, bg_csi=False):
    """Reference `common/utils.py:115-168`."""
    return np.asarray(
        boundary_ops.boundary_prob_maps(
            np.asarray(categorical_pred, np.float32), bg_ilm=bg_ilm, bg_csi=bg_csi
        )
    )


def md5(file_path: Path) -> str:
    """Reference `common/utils.py:171-176`."""
    log.info(f"Calculating md5 of file: {file_path}")
    with open(file_path, "rb") as file_to_check:
        return hashlib.md5(file_to_check.read()).hexdigest()


def load_model_and_config(model_path, **kwargs):
    """Reference `common/utils.py:26-70` — see :mod:`.model_io`."""
    from .model_io import load_model_and_config as _impl

    return _impl(model_path, **kwargs)
