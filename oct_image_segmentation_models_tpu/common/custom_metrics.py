"""Compatibility re-export: the reference exposes metrics at
`common/custom_metrics.py`; the TPU implementations live in
:mod:`..ops.metrics` and surface distances in
:mod:`.surface_distance`."""

from ..ops.metrics import (  # noqa: F401
    dice_coef_macro,
    dice_coef_micro,
    soft_dice_class,
    training_monitor_metric_objects,
)
from .surface_distance import (  # noqa: F401
    average_surface_distance,
    hausdorff_distance,
)
