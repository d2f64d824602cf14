"""Training-monitor and evaluation metrics, matching reference
`common/custom_metrics.py` formulas exactly.

The two training monitors (`dice_coef_micro`, `dice_coef_macro`) are pure
jnp and run inside the jitted train/eval step; the evaluation-only metrics
(`soft_dice_class`) accept numpy or jnp arrays. Surface-distance metrics
live in :mod:`..common.surface_distance` (scipy-based, since the DeepMind
``surface-distance`` package the reference pins is not vendored here).
"""

from __future__ import annotations

import jax.numpy as jnp

from .boundary import to_categorical
from ..common import (
    TRAINING_MONITOR_METRIC_DICE_MACRO,
    TRAINING_MONITOR_METRIC_DICE_MICRO,
)


def dice_coef_micro(is_y_true_sparse: bool, num_classes: int):
    """Global Dice of the 0.5-thresholded prediction — reference
    `custom_metrics.py:19-45` (note: no smoothing term, as in the
    reference; an empty union yields NaN there too)."""

    def _dice_coef_micro(y_true, y_pred):
        if is_y_true_sparse:
            if y_true.shape[-1] == 1:
                y_true = y_true[..., 0]
            y_true = to_categorical(y_true, num_classes)
        t = jnp.ravel(y_true).astype(jnp.float32)
        p = (jnp.ravel(y_pred).astype(jnp.float32) > 0.5).astype(jnp.float32)
        return 2.0 * jnp.sum(t * p) / (jnp.sum(t) + jnp.sum(p))

    _dice_coef_micro.__name__ = "dice_coef_micro"
    return _dice_coef_micro


def dice_coef_macro(is_y_true_sparse: bool, num_classes: int):
    """Per-class Dice of the 0.5-thresholded prediction, averaged over
    (batch, class) — reference `custom_metrics.py:49-77`."""

    def _dice_coef_macro(y_true, y_pred, eps=1e-05):
        if is_y_true_sparse:
            if y_true.shape[-1] == 1:
                y_true = y_true[..., 0]
            y_true = to_categorical(y_true, num_classes)
        p = (y_pred.astype(jnp.float32) > 0.5).astype(jnp.float32)
        t = y_true.astype(jnp.float32)
        reduce_axes = tuple(range(1, p.ndim - 1))
        intersection = jnp.sum(t * p, axis=reduce_axes)
        denom = jnp.sum(t, axis=reduce_axes) + jnp.sum(p, axis=reduce_axes)
        score = (2.0 * intersection + eps) / (denom + eps)
        return jnp.mean(score)

    _dice_coef_macro.__name__ = "dice_coef_macro"
    return _dice_coef_macro


training_monitor_metric_objects = {
    TRAINING_MONITOR_METRIC_DICE_MACRO: dice_coef_macro,
    TRAINING_MONITOR_METRIC_DICE_MICRO: dice_coef_micro,
}


def soft_dice_class(y_true, y_pred, eps=1e-5):
    """Per-(batch, class) soft Dice over class-first tensors
    ``(B, C, ...)`` — reference `custom_metrics.py:86-100`."""
    y_true = jnp.asarray(y_true, jnp.float32)
    y_pred = jnp.asarray(y_pred, jnp.float32)
    axes = tuple(range(2, y_pred.ndim))
    intersect = jnp.sum(y_pred * y_true, axis=axes)
    denom = jnp.sum(y_pred + y_true, axis=axes)
    return (2.0 * intersect + eps) / (denom + eps)
