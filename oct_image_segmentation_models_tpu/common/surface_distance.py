"""Surface-distance metrics (average symmetric surface distance, robust
Hausdorff) for 2-D binary masks.

The reference depends on DeepMind's ``surface-distance`` package
(`pyproject.toml:33`, used at reference `common/custom_metrics.py:103-119`
with spacing ``(0.01111111, 0.01111111)`` and 95th-percentile Hausdorff,
`evaluation/evaluation.py:207-260`). That package is not available in this
environment, so this module provides a scipy implementation with the same
API shape and semantics:

- a mask's *surface* is its morphological border (foreground pixels with a
  background 4-neighbour, image edges counting as background);
- distances are Euclidean, anisotropic via ``spacing``, computed with
  ``scipy.ndimage.distance_transform_edt``;
- empty masks yield ``inf`` distances (as DeepMind's implementation does),
  which the evaluation aggregation maps to NaN
  (`evaluation/evaluation.py:847`).

Documented divergence: DeepMind weights border elements by local contour
length from a 2x2 neighbourhood lookup table; here border pixels are
weighted uniformly. Values agree closely on smooth anatomy-scale masks.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy import ndimage


def _border(mask: np.ndarray) -> np.ndarray:
    mask = mask.astype(bool)
    if not mask.any():
        return mask
    eroded = ndimage.binary_erosion(
        mask,
        structure=ndimage.generate_binary_structure(mask.ndim, 1),
        border_value=0,
    )
    return mask & ~eroded


def compute_surface_distances(
    mask_gt: np.ndarray, mask_pred: np.ndarray, spacing_mm: Tuple[float, ...]
) -> dict:
    """Distances from each ground-truth border pixel to the prediction
    border and vice versa."""
    border_gt = _border(mask_gt)
    border_pred = _border(mask_pred)

    if border_pred.any():
        dist_to_pred = ndimage.distance_transform_edt(
            ~border_pred, sampling=spacing_mm
        )
    else:
        dist_to_pred = np.full(mask_gt.shape, np.inf)
    if border_gt.any():
        dist_to_gt = ndimage.distance_transform_edt(~border_gt, sampling=spacing_mm)
    else:
        dist_to_gt = np.full(mask_gt.shape, np.inf)

    return {
        "distances_gt_to_pred": dist_to_pred[border_gt],
        "distances_pred_to_gt": dist_to_gt[border_pred],
    }


def compute_average_surface_distance(surface_distances: dict):
    d_gt = surface_distances["distances_gt_to_pred"]
    d_pred = surface_distances["distances_pred_to_gt"]
    avg_gt_to_pred = np.mean(d_gt) if d_gt.size else np.inf
    avg_pred_to_gt = np.mean(d_pred) if d_pred.size else np.inf
    return avg_gt_to_pred, avg_pred_to_gt


def compute_robust_hausdorff(surface_distances: dict, percent: float) -> float:
    d_gt = surface_distances["distances_gt_to_pred"]
    d_pred = surface_distances["distances_pred_to_gt"]
    h_gt = np.percentile(d_gt, percent) if d_gt.size else np.inf
    h_pred = np.percentile(d_pred, percent) if d_pred.size else np.inf
    return max(h_gt, h_pred)


def average_surface_distance(
    y_true: np.ndarray, y_pred: np.ndarray, spacing: Tuple[float, ...]
):
    """Reference `common/custom_metrics.py:103-109` API."""
    return compute_average_surface_distance(
        compute_surface_distances(y_true, y_pred, spacing)
    )


def hausdorff_distance(
    y_true: np.ndarray,
    y_pred: np.ndarray,
    spacing: Tuple[float, ...],
    percent: float,
) -> float:
    """Reference `common/custom_metrics.py:112-119` API."""
    return compute_robust_hausdorff(
        compute_surface_distances(y_true, y_pred, spacing), percent
    )
