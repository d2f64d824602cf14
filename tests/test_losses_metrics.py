"""Losses/metrics vs hand-computed NumPy values (reference formulas)."""

import jax
import pytest
import numpy as np

from oct_image_segmentation_models_tpu.ops import losses, metrics


def _data(seed=0, b=2, h=6, w=5, c=3):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, c, size=(b, h, w, 1)).astype(np.uint8)
    logits = rng.normal(size=(b, h, w, c))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    onehot = np.eye(c, dtype=np.float32)[labels[..., 0]]
    return labels, onehot, probs.astype(np.float32)


def test_dice_loss_micro_matches_numpy():
    labels, onehot, probs = _data()
    fn = losses.dice_loss_micro(is_y_true_sparse=False, num_classes=3)
    got = float(jax.jit(fn)(onehot, probs))
    t, p = onehot.ravel(), probs.ravel()
    want = 1.0 - (2 * (t * p).sum() + 1e-5) / (t.sum() + p.sum() + 1e-5)
    assert abs(got - want) < 1e-6
    # Sparse input path gives the same value.
    fn_sparse = losses.dice_loss_micro(is_y_true_sparse=True, num_classes=3)
    assert abs(float(jax.jit(fn_sparse)(labels, probs)) - want) < 1e-6


def test_dice_loss_macro_matches_numpy():
    labels, onehot, probs = _data(1)
    fn = losses.dice_loss_macro(is_y_true_sparse=False, num_classes=3)
    got = float(jax.jit(fn)(onehot, probs))
    inter = (onehot * probs).sum(axis=(1, 2))
    denom = onehot.sum(axis=(1, 2)) + probs.sum(axis=(1, 2))
    want = 1.0 - ((2 * inter + 1e-5) / (denom + 1e-5)).mean()
    assert abs(got - want) < 1e-6


def test_bce_dice_loss_matches_numpy():
    labels, onehot, probs = _data(2)
    fn = losses.bce_dice_loss(num_classes=3)
    got = float(jax.jit(fn)(onehot, probs))
    eps = 1e-7
    p = np.clip(probs, eps, 1 - eps)
    bce = -(onehot * np.log(p) + (1 - onehot) * np.log(1 - p)).mean(-1)
    t, pr = onehot.ravel(), probs.ravel()
    dice = 1.0 - (2 * (t * pr).sum() + 1e-5) / (t.sum() + pr.sum() + 1e-5)
    assert abs(got - (bce.mean() + dice)) < 1e-5


def test_focal_loss_matches_numpy():
    labels, _, probs = _data(3)
    cw = np.array([1.0, 2.0, 0.5])
    fn = losses.focal_loss(gamma=2.0, class_weight=cw)
    got = float(jax.jit(fn)(labels, probs))
    lab = labels[..., 0]
    p_y = np.take_along_axis(probs, lab[..., None], axis=-1)[..., 0]
    want = (-((1 - p_y) ** 2) * np.log(p_y) * cw[lab]).mean()
    assert abs(got - want) < 1e-5


def test_focal_loss_short_class_weight_rejected():
    labels, _, probs = _data(3)  # 3 prediction channels
    fn = losses.focal_loss(gamma=2.0, class_weight=[1.0, 2.0])
    with pytest.raises(ValueError, match="class_weight"):
        jax.jit(fn)(labels, probs)


def test_focal_dice_combination():
    labels, _, probs = _data(4)
    fd = losses.focal_dice_loss(num_classes=3, focal_loss_weight=0.3)
    focal = losses.focal_loss(gamma=2.0)
    dice = losses.dice_loss_macro(is_y_true_sparse=True, num_classes=3)
    got = float(jax.jit(fd)(labels, probs))
    want = 0.3 * float(focal(labels, probs)) + 0.7 * float(dice(labels, probs))
    assert abs(got - want) < 1e-6


def test_registry_flags_match_reference():
    flags = {k: v["takes_sparse"] for k, v in losses.custom_loss_objects.items()}
    assert flags == {
        "bce_dice_loss": False,
        "dice_loss_micro": False,
        "dice_loss_macro": False,
        "focal_loss": True,
        "bce_focal_loss": False,
        "focal_dice_loss": True,
    }


def test_balanced_class_weight_matches_sklearn_formula():
    labels = np.array([0, 0, 0, 1, 2, 2])
    w = losses.compute_balanced_class_weight(labels)
    assert np.allclose(w, [6 / (3 * 3), 6 / (3 * 1), 6 / (3 * 2)])


def test_dice_coef_micro_threshold_semantics():
    labels, onehot, probs = _data(5)
    m = metrics.dice_coef_micro(is_y_true_sparse=False, num_classes=3)
    got = float(jax.jit(m)(onehot, probs))
    t = onehot.ravel()
    p = (probs.ravel() > 0.5).astype(np.float32)
    want = 2 * (t * p).sum() / (t.sum() + p.sum())
    assert abs(got - want) < 1e-6
    assert m.__name__ == "dice_coef_micro"


def test_dice_coef_macro_matches_numpy():
    labels, onehot, probs = _data(6)
    m = metrics.dice_coef_macro(is_y_true_sparse=True, num_classes=3)
    got = float(jax.jit(m)(labels, probs))
    p = (probs > 0.5).astype(np.float32)
    inter = (onehot * p).sum(axis=(1, 2))
    denom = onehot.sum(axis=(1, 2)) + p.sum(axis=(1, 2))
    want = ((2 * inter + 1e-5) / (denom + 1e-5)).mean()
    assert abs(got - want) < 1e-6


def test_soft_dice_class_shape_and_value():
    labels, onehot, probs = _data(7)
    cat_t = np.transpose(onehot, (0, 3, 1, 2))
    cat_p = np.transpose(probs, (0, 3, 1, 2))
    got = np.asarray(metrics.soft_dice_class(cat_t, cat_p))
    assert got.shape == (2, 3)
    inter = (cat_t * cat_p).sum(axis=(2, 3))
    denom = (cat_t + cat_p).sum(axis=(2, 3))
    assert np.allclose(got, (2 * inter + 1e-5) / (denom + 1e-5), atol=1e-6)


def test_surface_distance_basic():
    from oct_image_segmentation_models_tpu.common import surface_distance as sd

    a = np.zeros((20, 20), bool)
    a[5:15, 5:15] = True
    b = np.zeros((20, 20), bool)
    b[6:16, 5:15] = True  # shifted down by 1
    d_gt, d_pred = sd.average_surface_distance(a, b, spacing=(1.0, 1.0))
    assert 0 < d_gt < 1.0 and 0 < d_pred < 1.0
    h = sd.hausdorff_distance(a, b, spacing=(1.0, 1.0), percent=100)
    assert abs(h - 1.0) < 1e-6
    # identical masks -> zero distances
    d0 = sd.average_surface_distance(a, a, spacing=(1.0, 1.0))
    assert d0 == (0.0, 0.0)
    # empty pred mask, DeepMind's exact asymmetric conventions:
    # gt->pred distances exist but reach nothing (mean inf), the empty
    # side's ASD is nan (their unguarded 0/0), and the robust Hausdorff
    # is inf (their explicit empty-case return)
    dinf, dnan = sd.average_surface_distance(a, np.zeros_like(a), (1.0, 1.0))
    assert np.isinf(dinf) and np.isnan(dnan)
    hinf = sd.hausdorff_distance(a, np.zeros_like(a), (1.0, 1.0), percent=95)
    assert np.isinf(hinf)


def test_surface_distance_contour_length_weighting():
    """DeepMind-parity hand-check (reference pins the `surface-distance`
    package, `custom_metrics.py:103-119`): border elements are 2x2
    neighbour-code cells weighted by marching-squares contour length —
    diagonal cuts weigh 0.5*hypot(dy,dx), axis cuts the full spacing —
    and ASD / robust Hausdorff are contour-length-weighted statistics."""
    import math

    from oct_image_segmentation_models_tpu.common import surface_distance as sd

    d = 0.5 * math.sqrt(2.0)  # diagonal cut at unit spacing

    # gt: single pixel at (3,3) -> 4 diagonal border cells, perimeter 4d.
    gt = np.zeros((8, 8), bool)
    gt[3, 3] = True
    # pred: 2x2 block at (3..4, 3..4) -> 4 diagonal corner cells + 4 axis
    # edge cells, perimeter 4d + 4.
    pred = np.zeros((8, 8), bool)
    pred[3:5, 3:5] = True

    out = sd.compute_surface_distances(gt, pred, (1.0, 1.0))
    assert np.isclose(np.sum(out["surfel_areas_gt"]), 4 * d)
    assert np.isclose(np.sum(out["surfel_areas_pred"]), 4 * d + 4)

    asd_gt, asd_pred = sd.compute_average_surface_distance(out)
    # gt->pred: three gt cells coincide with pred borders (0), the cell at
    # (4,4) sits inside pred (nearest border 1 away); uniform diag weights.
    assert np.isclose(asd_gt, 0.25)
    # pred->gt by hand: 3 coincident cells, corners (3,5)/(5,3) at 1,
    # corner (5,5) at sqrt(2), edges (5,4)/(4,5) at 1:
    #   (d*1 + d*1 + d*sqrt(2) + 1*1 + 1*1) / (4d + 4)
    expected = (2 * d + d * math.sqrt(2.0) + 2.0) / (4 * d + 4.0)
    assert np.isclose(asd_pred, expected)
    # Weighting matters: the uniform mean would differ.
    uniform = (2 * 1 + math.sqrt(2.0) + 2 * 1) / 8.0
    assert not np.isclose(asd_pred, uniform)

    h100 = sd.compute_robust_hausdorff(out, 100)
    assert np.isclose(h100, math.sqrt(2.0))

    # Weighted percentile: cumulative contour length in distance order.
    # pred->gt sorted distances [0,0,0,1,1,1,1,sqrt(2)] with weights
    # [d,1,1, d,d,1,1, d]; cumulative/total crosses 0.5 inside the
    # distance-1 run -> H50 = 1.
    h50 = sd.compute_robust_hausdorff(out, 50)
    assert np.isclose(h50, 1.0)


def test_focal_loss_out_of_range_labels_stay_finite():
    """A label value >= the prediction channel count (e.g. a class only
    present in validation) must give a finite loss, not log(0)."""
    import jax.numpy as jnp
    import numpy as np

    from oct_image_segmentation_models_tpu.ops.losses import focal_dice_loss

    loss_fn = focal_dice_loss(num_classes=3, class_weight=[1.0, 2.0, 1.0, 9.0])
    y_pred = jnp.full((2, 4, 4, 3), 1.0 / 3)
    y_true = jnp.asarray(np.full((2, 4, 4, 1), 3, np.int32))  # class 3 of 3
    assert np.isfinite(float(loss_fn(y_true, y_pred)))


def test_weighted_categorical_crossentropy_matches_numpy():
    """Reference `custom_losses.py:11-37`: renormalize, clip with the
    Keras epsilon, -sum(t * log(p) * w) over channels, mean-reduced."""
    _, onehot, probs = _data()
    w = np.array([0.5, 2.0, 10.0], np.float32)
    fn = losses.weighted_categorical_crossentropy(w)
    got = float(jax.jit(fn)(onehot, probs))
    p = probs / probs.sum(-1, keepdims=True)
    p = np.clip(p, 1e-7, 1 - 1e-7)
    want = float(np.mean(-(onehot * np.log(p) * w).sum(-1)))
    assert abs(got - want) < 1e-5


def test_weighted_bce_and_dice_losses_match_numpy():
    """Reference `custom_losses.py:187-207`: stable-logit weighted BCE
    normalized by weight mass; weight-mass soft Dice with smooth=1."""
    rng = np.random.default_rng(3)
    t = rng.integers(0, 2, (2, 6, 5, 1)).astype(np.float32)
    p = rng.uniform(0.01, 0.99, (2, 6, 5, 1)).astype(np.float32)
    w = rng.uniform(0.1, 2.0, (2, 6, 5, 1)).astype(np.float32)

    got = float(jax.jit(losses.weighted_bce_loss)(t, p, w))
    pc = np.clip(p, 1e-7, 1 - 1e-7)
    logit = np.log(pc / (1 - pc))
    elem = w * (
        logit * (1 - t) + np.log1p(np.exp(-np.abs(logit)))
        + np.maximum(-logit, 0.0)
    )
    want = float(elem.sum() / w.sum())
    assert abs(got - want) < 1e-5
    # the stable form IS elementwise BCE: -w*(t*log(p)+(1-t)*log(1-p))
    plain = -(w * (t * np.log(pc) + (1 - t) * np.log(1 - pc))).sum() / w.sum()
    assert abs(got - plain) < 1e-5

    got_d = float(jax.jit(losses.weighted_dice_loss)(t, p, w))
    want_d = 1.0 - (2 * (w * t * p).sum() + 1.0) / (
        (w * t).sum() + (w * p).sum() + 1.0
    )
    assert abs(got_d - want_d) < 1e-6


def test_bce_logdice_loss_matches_numpy():
    """Reference `custom_losses.py:181-184` with the factory-call repair:
    mean BCE − log(1 − micro-Dice)."""
    _, onehot, probs = _data(seed=5)
    got = float(jax.jit(losses.bce_logdice_loss)(onehot, probs))
    pc = np.clip(probs, 1e-7, 1 - 1e-7)
    bce = np.mean(
        -(onehot * np.log(pc) + (1 - onehot) * np.log(1 - pc)).mean(-1)
    )
    t, p = onehot.ravel(), probs.ravel()
    dice = 1.0 - (2 * (t * p).sum() + 1e-5) / (t.sum() + p.sum() + 1e-5)
    want = bce - np.log(1.0 - dice)
    assert abs(got - want) < 1e-5


def _np_same_avg_pool(x, size):
    """Valid-elements-only SAME average pooling (TF pad split: lo = (size-1)//2)."""
    b, h, w, c = x.shape
    lo = (size - 1) // 2
    out = np.zeros_like(x, np.float64)
    for i in range(h):
        for j in range(w):
            r0, r1 = max(0, i - lo), min(h, i - lo + size)
            c0, c1 = max(0, j - lo), min(w, j - lo + size)
            out[:, i, j, :] = x[:, r0:r1, c0:c1, :].mean(axis=(1, 2))
    return out


def test_weighted_bce_dice_loss_matches_numpy():
    """Reference `custom_losses.py:210-226`: border weights from a 50×50
    SAME average pool of the mask (valid-element averaging), ×5 peak at
    0.5, renormalized to unit mean; plus micro Dice."""
    from oct_image_segmentation_models_tpu.ops.losses import (
        _same_avg_pool_hw,
    )

    rng = np.random.default_rng(7)
    # First check the pooling primitive on a window smaller than the image.
    x = rng.uniform(size=(1, 7, 9, 1)).astype(np.float32)
    got_pool = np.asarray(_same_avg_pool_hw(jax.numpy.asarray(x), 4))
    assert np.allclose(got_pool, _np_same_avg_pool(x, 4), atol=1e-6)

    t = rng.integers(0, 2, (1, 8, 7, 1)).astype(np.float32)
    p = rng.uniform(0.01, 0.99, (1, 8, 7, 1)).astype(np.float32)
    got = float(jax.jit(losses.weighted_bce_dice_loss)(t, p))
    avg = _np_same_avg_pool(t, 50)
    weight = 5.0 * np.exp(-5.0 * np.abs(avg - 0.5))
    weight *= avg.size / weight.sum()
    pc = np.clip(p, 1e-7, 1 - 1e-7)
    bce = -(weight * (t * np.log(pc) + (1 - t) * np.log(1 - pc))).sum()
    bce /= weight.sum()
    tf_, pf = t.ravel(), p.ravel()
    dice = 1.0 - (2 * (tf_ * pf).sum() + 1e-5) / (tf_.sum() + pf.sum() + 1e-5)
    assert abs(got - (bce + dice)) < 1e-5


def test_reference_import_path_compat():
    """The reference exposes losses/metrics at common.custom_losses /
    common.custom_metrics (reference `common/custom_losses.py:230`,
    `common/custom_metrics.py:80`); the compat shims must keep those
    import paths working and pointing at the same objects."""
    from oct_image_segmentation_models_tpu.common import (
        custom_losses as cl,
        custom_metrics as cm,
    )
    from oct_image_segmentation_models_tpu.common.surface_distance import (
        average_surface_distance,
        hausdorff_distance,
    )

    assert cl.custom_loss_objects is losses.custom_loss_objects
    # off-registry reference losses remain importable (reference
    # `custom_losses.py:11,181,187,199,210`)
    for name in (
        "weighted_categorical_crossentropy", "bce_logdice_loss",
        "weighted_bce_loss", "weighted_dice_loss", "weighted_bce_dice_loss",
    ):
        assert getattr(cl, name) is getattr(losses, name)
    assert set(cl.custom_loss_objects) == {
        "bce_dice_loss", "dice_loss_micro", "dice_loss_macro",
        "focal_loss", "bce_focal_loss", "focal_dice_loss",
    }
    assert cm.training_monitor_metric_objects is (
        metrics.training_monitor_metric_objects
    )
    assert cm.average_surface_distance is average_surface_distance
    assert cm.hausdorff_distance is hausdorff_distance
