"""Training losses in pure jnp, matching reference `common/custom_losses.py`.

Every factory mirrors the reference registry entry's semantics and keyword
surface (num_classes / is_y_true_sparse / loss-specific kwargs), returning a
``fn(y_true, y_pred) -> scalar`` usable inside a jitted train step.

Conventions:
- ``y_pred``: ``(B, ..., C)`` softmax probabilities, channels last;
- ``y_true``: one-hot ``(B, ..., C)`` when the loss registers
  ``takes_sparse=False``, else integer labels ``(B, ..., 1)`` or ``(B, ...)``;
- scalar reduction is the mean over all elements, as Keras' default
  ``Reduction.AUTO`` produces for the reference's compiled losses.

Divergence from the reference (documented): the reference's
``bce_focal_loss`` (`custom_losses.py:94-95`) calls the focal factory with
tensor arguments and would crash at trace time; here it is implemented as
the evidently intended mean(BCE) + mean(focal, gamma=2).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .boundary import to_categorical

_EPS_KERAS = 1e-7  # keras.backend.epsilon()


def _squeeze_labels(y_true):
    """Drop a trailing singleton channel axis (robust to batch-1 shards,
    unlike the reference's full ``tf.squeeze``)."""
    if y_true.ndim and y_true.shape[-1] == 1:
        return y_true[..., 0]
    return y_true


def _maybe_one_hot(y_true, num_classes, is_sparse):
    if is_sparse:
        return to_categorical(_squeeze_labels(y_true), num_classes)
    return y_true


def dice_loss_micro(*, is_y_true_sparse: bool, num_classes: int, **kwargs):
    """Global (micro) soft-Dice loss — reference `custom_losses.py:48-62`."""

    def _dice_loss_micro(y_true, y_pred, smooth=1e-05):
        y_true = _maybe_one_hot(y_true, num_classes, is_y_true_sparse)
        t = jnp.ravel(y_true).astype(jnp.float32)
        p = jnp.ravel(y_pred).astype(jnp.float32)
        intersection = jnp.sum(t * p)
        score = (2.0 * intersection + smooth) / (jnp.sum(t) + jnp.sum(p) + smooth)
        return 1.0 - score

    return _dice_loss_micro


def dice_loss_macro(*, is_y_true_sparse: bool, num_classes: int, **kwargs):
    """Per-class (macro) soft-Dice loss — reference `custom_losses.py:66-81`."""

    def _dice_loss_macro(y_true, y_pred, smooth=1e-05):
        y_true = _maybe_one_hot(y_true, num_classes, is_y_true_sparse)
        reduce_axes = tuple(range(1, y_pred.ndim - 1))
        y_true = y_true.astype(jnp.float32)
        y_pred = y_pred.astype(jnp.float32)
        intersection = jnp.sum(y_true * y_pred, axis=reduce_axes)
        denom = jnp.sum(y_true, axis=reduce_axes) + jnp.sum(y_pred, axis=reduce_axes)
        score = (2.0 * intersection + smooth) / (denom + smooth)
        return 1.0 - jnp.mean(score)

    return _dice_loss_macro


def _binary_crossentropy(y_true, y_pred):
    """Keras ``binary_crossentropy``: per-element BCE with probability
    clipping, averaged over the channel axis."""
    p = jnp.clip(y_pred.astype(jnp.float32), _EPS_KERAS, 1.0 - _EPS_KERAS)
    t = y_true.astype(jnp.float32)
    bce = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    return jnp.mean(bce, axis=-1)


def bce_dice_loss(*, num_classes: int, **kwargs):
    """Binary cross-entropy + micro Dice — reference `custom_losses.py:85-91`."""
    dice_fn = dice_loss_micro(is_y_true_sparse=False, num_classes=num_classes)

    def _bce_dice_loss(y_true, y_pred):
        return jnp.mean(_binary_crossentropy(y_true, y_pred)) + dice_fn(
            y_true, y_pred
        )

    return _bce_dice_loss


def _sparse_focal_map(y_true, y_pred, gamma, class_weight):
    """Per-pixel sparse categorical focal loss
    ``-w[y] * (1 - p_y)^gamma * log(p_y)`` (the `focal-loss` package's
    SparseCategoricalFocalLoss used at reference `custom_losses.py:41-44`)."""
    labels = _squeeze_labels(y_true).astype(jnp.int32)
    p = jnp.clip(y_pred.astype(jnp.float32), _EPS_KERAS, 1.0)
    # One-hot multiply-sum instead of take_along_axis: a gather along
    # the minor (lane) axis lowers catastrophically on TPU (measured
    # ~70 ms per call at (8, 512, 1024, 4) vs ~2 ms for this form).
    oh = jax.nn.one_hot(labels, p.shape[-1], dtype=jnp.float32)
    # Re-clip: an out-of-range label gives an all-zero one-hot row, and
    # log(0) would poison the whole loss with -inf (labels can exceed
    # the channel count when e.g. a class appears only in validation).
    # NB the two configurations treat such pixels differently — without
    # class_weight each contributes the constant -log(_EPS_KERAS)
    # (~16.1, zero-gradient since p_y sits at the clip floor); with
    # class_weight the all-zero one-hot row zeroes the weight and the
    # pixel drops out entirely. Both are degenerate-input salvage modes
    # (the training driver derives num_classes from the labels, so
    # in-range data never hits either); their reported losses are not
    # comparable to each other on such data.
    p_y = jnp.clip(jnp.sum(p * oh, axis=-1), _EPS_KERAS, 1.0)
    focal = -((1.0 - p_y) ** gamma) * jnp.log(p_y)
    if class_weight is not None:
        w = jnp.asarray(np.asarray(class_weight), jnp.float32)
        if w.shape[0] < p.shape[-1]:
            raise ValueError(
                f"class_weight has {w.shape[0]} entries but predictions "
                f"have {p.shape[-1]} channels; provide one weight per class"
            )
        # tolerate weight lists longer than the prediction channels
        focal = focal * jnp.sum(oh * w[: p.shape[-1]], axis=-1)
    return focal


def focal_loss(
    gamma: float = 2,
    class_weight: Optional[np.ndarray] = None,
    **kwargs,
):
    """Sparse categorical focal loss — reference `custom_losses.py:40-44`."""

    def _focal_loss(y_true, y_pred):
        return jnp.mean(_sparse_focal_map(y_true, y_pred, gamma, class_weight))

    return _focal_loss


def focal_dice_loss(
    *,
    num_classes: int,
    gamma: float = 2,
    class_weight: Optional[np.ndarray] = None,
    focal_loss_weight: float = 0.5,
    dice_macro: bool = True,
    **kwargs,
):
    """Weighted focal + Dice combination — reference
    `custom_losses.py:100-178` (SparseCategoricalFocalDiceLoss): the focal
    term is averaged over the local batch (`:149-159`) and combined as
    ``w * focal + (1 - w) * dice``; Dice consumes the sparse labels."""
    dice_factory = dice_loss_macro if dice_macro else dice_loss_micro
    dice_fn = dice_factory(is_y_true_sparse=True, num_classes=num_classes)

    def _focal_dice_loss(y_true, y_pred):
        focal = jnp.mean(_sparse_focal_map(y_true, y_pred, gamma, class_weight))
        dice = dice_fn(y_true, y_pred)
        return focal_loss_weight * focal + (1.0 - focal_loss_weight) * dice

    return _focal_dice_loss


def bce_focal_loss(*, num_classes: int, gamma: float = 2, **kwargs):
    """BCE + focal. The reference registers this (`custom_losses.py:247-250`)
    but its implementation (`:94-95`) is broken; this is the intended
    behaviour, with the focal term computed from the one-hot argmax labels."""

    def _bce_focal_loss(y_true, y_pred):
        sparse = jnp.argmax(y_true, axis=-1)
        bce = jnp.mean(_binary_crossentropy(y_true, y_pred))
        focal = jnp.mean(_sparse_focal_map(sparse, y_pred, gamma, None))
        return bce + focal

    return _bce_focal_loss


def weighted_categorical_crossentropy(weights):
    """Class-weighted categorical cross-entropy — reference
    `custom_losses.py:11-37` (off-registry, importable API). ``weights`` is
    a ``(C,)`` per-class weight vector; predictions are renormalized across
    the channel axis and clipped with the Keras epsilon before the log."""
    w = jnp.asarray(np.asarray(weights), jnp.float32)

    def loss(y_true, y_pred):
        p = y_pred.astype(jnp.float32)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        p = jnp.clip(p, _EPS_KERAS, 1.0 - _EPS_KERAS)
        ce = -jnp.sum(y_true.astype(jnp.float32) * jnp.log(p) * w, axis=-1)
        return jnp.mean(ce)

    return loss


def bce_logdice_loss(y_true, y_pred):
    """BCE − log(1 − micro-Dice) — reference `custom_losses.py:181-184`.
    The reference calls the ``dice_loss_micro`` factory as if it were the
    loss itself (a crash at call time, like ``bce_focal_loss``); this is
    the evident intent: the inner micro-Dice on dense one-hot labels."""
    dice = dice_loss_micro(is_y_true_sparse=False, num_classes=None)
    bce = jnp.mean(_binary_crossentropy(y_true, y_pred))
    return bce - jnp.log(1.0 - dice(y_true, y_pred))


def weighted_bce_loss(y_true, y_pred, weight):
    """Per-element-weighted BCE in the numerically-stable logit form,
    normalized by the weight mass — reference `custom_losses.py:187-196`."""
    t = y_true.astype(jnp.float32)
    p = jnp.clip(y_pred.astype(jnp.float32), _EPS_KERAS, 1.0 - _EPS_KERAS)
    logit = jnp.log(p / (1.0 - p))
    loss = weight * (
        logit * (1.0 - t)
        + jnp.log1p(jnp.exp(-jnp.abs(logit)))
        + jnp.maximum(-logit, 0.0)
    )
    return jnp.sum(loss) / jnp.sum(weight)


def weighted_dice_loss(y_true, y_pred, weight):
    """Weight-mass soft Dice — reference `custom_losses.py:199-207`."""
    w = weight
    m1 = y_true.astype(jnp.float32)
    m2 = y_pred.astype(jnp.float32)
    smooth = 1.0
    score = (2.0 * jnp.sum(w * m1 * m2) + smooth) / (
        jnp.sum(w * m1) + jnp.sum(w * m2) + smooth
    )
    return 1.0 - score


def _same_avg_pool_hw(x, size):
    """Average pool over the two spatial axes of ``(B, H, W, C)`` with
    stride 1 and SAME padding, averaging only the valid (non-padded)
    window elements — TF's ``tf.nn.pool(pooling_type='AVG')`` semantics
    behind Keras ``K.pool2d`` at reference `custom_losses.py:214-220`."""
    window = (1, size, size, 1)
    ones = (1, 1, 1, 1)
    sums = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, window, ones, "SAME"
    )
    counts = jax.lax.reduce_window(
        jnp.ones_like(x, jnp.float32), 0.0, jax.lax.add, window, ones, "SAME"
    )
    return sums / counts


def weighted_bce_dice_loss(y_true, y_pred):
    """Border-emphasizing weighted BCE + micro Dice — reference
    `custom_losses.py:210-226`: weights peak (×5, renormalized to unit
    mean) where a 50×50 local average of the binary mask is near 0.5,
    i.e. along class borders. Same factory-called-as-loss repair as
    :func:`bce_logdice_loss` for the Dice term."""
    t = y_true.astype(jnp.float32)
    p = y_pred.astype(jnp.float32)
    averaged_mask = _same_avg_pool_hw(t, 50)
    weight = 5.0 * jnp.exp(-5.0 * jnp.abs(averaged_mask - 0.5))
    w0 = jnp.asarray(averaged_mask.size, jnp.float32)
    weight = weight * (w0 / jnp.sum(weight))
    dice = dice_loss_micro(is_y_true_sparse=False, num_classes=None)
    return weighted_bce_loss(t, p, weight) + dice(t, p)


def compute_balanced_class_weight(labels: np.ndarray) -> np.ndarray:
    """``sklearn class_weight='balanced'``: n / (num_classes * bincount) —
    used at reference `training/training.py:200-206`."""
    labels = np.asarray(labels).ravel().astype(np.int64)
    classes, counts = np.unique(labels, return_counts=True)
    weights = labels.size / (len(classes) * counts.astype(np.float64))
    out = np.zeros(int(classes.max()) + 1, dtype=np.float64)
    out[classes] = weights
    return out


# Registry mirroring reference `custom_losses.py:230-255`.
custom_loss_objects = {
    "bce_dice_loss": {"function": bce_dice_loss, "takes_sparse": False},
    "dice_loss_micro": {"function": dice_loss_micro, "takes_sparse": False},
    "dice_loss_macro": {"function": dice_loss_macro, "takes_sparse": False},
    "focal_loss": {"function": focal_loss, "takes_sparse": True},
    "bce_focal_loss": {"function": bce_focal_loss, "takes_sparse": False},
    "focal_dice_loss": {"function": focal_dice_loss, "takes_sparse": True},
}
