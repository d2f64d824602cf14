"""Boundary-map ops, fused on device.

Reimplements (bit-exactly, in jnp) the reference's NumPy post-processing:

- ``perform_argmax``  — reference `common/utils.py:80-112`
- ``convert_predictions_to_maps_semantic`` (class probabilities -> per-
  boundary "boundary probability maps")  — reference `common/utils.py:115-168`
- ``create_area_mask`` (boundary rows -> dense region mask, incl. the
  NaN/0 repair semantics)  — reference `common/dataset_construction.py:654-708`

The reference runs these per-sample in Python loops on the host; here they
are batched jnp ops that XLA fuses into the inference pipeline, so class
probabilities never leave HBM between the model softmax and the min-path
kernel.

Conventions (identical to the reference):
- label/probability tensors are channels-last ``(B, H, W, C)``;
- "categorical" tensors are class-first ``(B, C, H, W)``;
- a boundary belongs to the first pixel (row) of its *next* region, i.e.
  boundary ``i`` is the first row where ``label == i+1``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def to_categorical(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """One-hot encode integer labels (float32), like keras
    ``to_categorical`` — including its quirk of dropping a trailing
    singleton axis before encoding."""
    labels = jnp.asarray(labels)
    if labels.ndim > 1 and labels.shape[-1] == 1:
        labels = labels[..., 0]
    return jax.nn.one_hot(labels.astype(jnp.int32), num_classes, dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=("bin",))
def perform_argmax(predictions: jnp.ndarray, bin: bool = True):
    """Argmax class map + class-first categorical tensor.

    Args:
      predictions: ``(B, H, W, C)`` class probabilities (channels last).
      bin: if True the categorical output is the one-hot of the argmax;
        otherwise it is the raw probabilities, transposed class-first.

    Returns:
      ``(argmax_pred, categorical_pred)`` with shapes ``(B, H, W)`` and
      ``(B, C, H, W)``. Matches reference `common/utils.py:80-112`.
    """
    num_classes = predictions.shape[3]
    argmax_pred = jnp.argmax(predictions, axis=3)
    if bin:
        categorical = to_categorical(argmax_pred, num_classes)
        categorical = jnp.transpose(categorical, (0, 3, 1, 2))
    else:
        categorical = jnp.transpose(predictions, (0, 3, 1, 2))
    return argmax_pred, categorical


def _vertical_gradient(x: jnp.ndarray) -> jnp.ndarray:
    """``np.gradient(x, axis=-2)``: central differences inside, one-sided
    differences at the first/last row. ``x``: (..., H, W)."""
    interior = (x[..., 2:, :] - x[..., :-2, :]) * 0.5
    first = x[..., 1:2, :] - x[..., 0:1, :]
    last = x[..., -1:, :] - x[..., -2:-1, :]
    return jnp.concatenate([first, interior, last], axis=-2)


def _ridge_from_gradient(grad: jnp.ndarray) -> jnp.ndarray:
    """Shared tail of the reference conversion: clip negatives, scale x2,
    subtract the one-row-up roll, clip again (`common/utils.py:140-147`)."""
    grad = jnp.maximum(grad, 0.0) * 2.0
    rolled = jnp.roll(grad, -1, axis=-2)
    return jnp.maximum(grad - rolled, 0.0)


def _to_uint8_wrap(x: jnp.ndarray) -> jnp.ndarray:
    """``(x * 255).astype(uint8)`` with NumPy C-cast wraparound semantics
    (a ridge value of 2.0 wraps to 254, reference `common/utils.py:73-77`)."""
    return (x * 255.0).astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("bg_ilm", "bg_csi"))
def boundary_prob_maps(
    categorical_pred: jnp.ndarray,
    bg_ilm: bool = True,
    bg_csi: bool = False,
) -> jnp.ndarray:
    """Per-boundary probability maps from class-first one-hot predictions.

    For boundary ``i`` (between region ``i`` and region ``i+1``) the map is
    the positive part of the vertical gradient of region ``i+1``'s mask,
    thinned to a single row; when ``bg_ilm`` (first boundary) or ``bg_csi``
    (last boundary) is set, the *preceding* region's mask is used with a
    negated gradient instead — reference `common/utils.py:115-168`.

    Args:
      categorical_pred: ``(B, C, H, W)`` float one-hot (or probabilities).

    Returns:
      ``(B, C-1, H, W)`` uint8 maps, 255 on the boundary ridge.
    """
    num_maps = categorical_pred.shape[1]
    maps = []
    for map_ind in range(1, num_maps):
        use_bg = (map_ind == 1 and bg_ilm) or (map_ind == num_maps - 1 and bg_csi)
        if use_bg:
            grad = -_vertical_gradient(categorical_pred[:, map_ind - 1])
        else:
            grad = _vertical_gradient(categorical_pred[:, map_ind])
        maps.append(_to_uint8_wrap(_ridge_from_gradient(grad)))
    return jnp.stack(maps, axis=1)


@functools.partial(
    jax.jit, static_argnames=("num_classes", "bg_ilm", "bg_csi")
)
def boundary_maps_from_labels(
    labels: jnp.ndarray,
    num_classes: int,
    bg_ilm: bool = True,
    bg_csi: bool = False,
) -> jnp.ndarray:
    """Integer-only fast path for :func:`boundary_prob_maps` on *argmax*
    labels: identical output, but computed from the ``(B, H, W)`` label
    map with int8-sized arithmetic instead of materialising the
    class-first float32 one-hot (134 MB + a layout change at the
    flagship shape). Since the one-hot is binary, ``2 * np.gradient``
    takes values in {-2..2} and the ridge tail in {0, 1, 2}, so the
    whole conversion is exact in integers; the final ``*255`` uint8 cast
    wraps 510 -> 254 exactly like the reference
    (`common/utils.py:73-77,140-147`).
    """
    lab = labels.astype(jnp.int32)

    def vgrad2(oh):
        # 2 * np.gradient(oh, axis=-2): central diffs inside, doubled
        # one-sided diffs at the edges.
        interior = oh[..., 2:, :] - oh[..., :-2, :]
        first = 2 * (oh[..., 1:2, :] - oh[..., 0:1, :])
        last = 2 * (oh[..., -1:, :] - oh[..., -2:-1, :])
        return jnp.concatenate([first, interior, last], axis=-2)

    maps = []
    for map_ind in range(1, num_classes):
        use_bg = (map_ind == 1 and bg_ilm) or (
            map_ind == num_classes - 1 and bg_csi
        )
        if use_bg:
            g2 = -vgrad2((lab == map_ind - 1).astype(jnp.int32))
        else:
            g2 = vgrad2((lab == map_ind).astype(jnp.int32))
        r = jnp.maximum(g2, 0)  # == relu(grad) * 2
        v = jnp.maximum(r - jnp.roll(r, -1, axis=-2), 0)
        maps.append((v * 255).astype(jnp.uint8))
    return jnp.stack(maps, axis=1)


@functools.partial(
    jax.jit, static_argnames=("num_classes", "bg_ilm", "bg_csi", "transposed")
)
def boundary_maps_from_s2d_labels(
    lab_s2d: jnp.ndarray,
    num_classes: int,
    bg_ilm: bool = True,
    bg_csi: bool = False,
    transposed: bool = False,
) -> jnp.ndarray:
    """:func:`boundary_maps_from_labels` computed in the space-to-depth
    domain (TPU layout optimization).

    The s2d U-Net head emits argmax labels as ``(B, H/2, W/2, 4)`` uint8
    with channel layout ``(q_h, q_w)`` (:mod:`.s2d_unet` with
    ``output="labels"``). Depth-to-spacing them to ``(B, H, W)`` first
    hands XLA a tensor it lays out batch-minor (8/128 vector lanes used),
    which makes every row-shift of the conversion ~16x slower (measured
    1.2 ms per slice-subtract at the flagship shape on v5e). Computing
    the vertical-gradient ridge directly on the s2d tensor keeps the
    conv-native channel-minor layout: rows ``2i``/``2i+1`` live in the
    ``q_h`` phase channels, so the ``r±1`` neighbourhoods become block
    shifts along the H/2 axis, and only the final 1-byte maps are
    depth-to-spaced. Output is identical to
    ``boundary_maps_from_labels(d2s(labels), ...)``.

    Args:
      lab_s2d: ``(B, Hb, Wb, 4)`` integer class labels, s2d layout.
      transposed: if True, return maps in the min-path's ``(..., W, H)``
        column-major orientation instead of image ``(..., H, W)``;
        "s2d" returns the raw ``(B, C-1, Hb, Wb, 4)`` s2d-form maps
        (for :func:`.minpath_pallas.delineate_pallas_s2d`, which packs
        them into its kernel layout with a single permutation).

    Returns:
      ``(B, C-1, H, W)`` uint8 maps (or ``(B, C-1, W, H)`` when
      ``transposed``; ``(B, C-1, Hb, Wb, 4)`` when ``transposed="s2d"``).
    """
    lab = lab_s2d.astype(jnp.int32)
    a = lab[..., 0:2]  # rows 2i   (q_h = 0), channels = q_w
    b = lab[..., 2:4]  # rows 2i+1 (q_h = 1)

    def ridge(cls, sign):
        oha = (a == cls).astype(jnp.int32)
        ohb = (b == cls).astype(jnp.int32)
        # g2 = sign * 2 * np.gradient(oh, axis=rows), split by row parity:
        #   row 2i   (i>=1): oh[2i+1] - oh[2i-1] = ohb[i] - ohb[i-1]
        #   row 0          : 2*(oh[1] - oh[0])   = 2*(ohb[0] - oha[0])
        #   row 2i+1 (i<nh-1): oh[2i+2] - oh[2i] = oha[i+1] - oha[i]
        #   row H-1        : 2*(oh[H-1] - oh[H-2]) = 2*(ohb[-1] - oha[-1])
        g2_even = jnp.concatenate(
            [
                2 * (ohb[:, :1] - oha[:, :1]),
                ohb[:, 1:] - ohb[:, :-1],
            ],
            axis=1,
        )
        g2_odd = jnp.concatenate(
            [
                oha[:, 1:] - oha[:, :-1],
                2 * (ohb[:, -1:] - oha[:, -1:]),
            ],
            axis=1,
        )
        rr_even = jnp.maximum(sign * g2_even, 0)
        rr_odd = jnp.maximum(sign * g2_odd, 0)
        # v[r] = max(rr[r] - rr[(r+1) mod H], 0)  (np.roll wraps)
        rr_even_next = jnp.concatenate([rr_even[:, 1:], rr_even[:, :1]], axis=1)
        v_even = jnp.maximum(rr_even - rr_odd, 0)
        v_odd = jnp.maximum(rr_odd - rr_even_next, 0)
        # back to (q_h, q_w) channel layout, * 255 with C-cast wraparound
        v = jnp.concatenate([v_even, v_odd], axis=-1) * 255
        return v.astype(jnp.uint8)

    maps = []
    for map_ind in range(1, num_classes):
        use_bg = (map_ind == 1 and bg_ilm) or (
            map_ind == num_classes - 1 and bg_csi
        )
        if use_bg:
            maps.append(ridge(map_ind - 1, -1))
        else:
            maps.append(ridge(map_ind, 1))
    m = jnp.stack(maps, axis=1)  # (B, M, Hb, Wb, 4)
    if transposed == "s2d":
        return m
    if transposed:
        return s2d_maps_to_transposed(m)
    return s2d_maps_to_image(m)


def s2d_maps_to_image(m: jnp.ndarray) -> jnp.ndarray:
    """s2d-form maps ``(B, M, Hb, Wb, 4)`` -> image ``(B, M, H, W)``."""
    B, M, Hb, Wb, _ = m.shape
    m = m.reshape(B, M, Hb, Wb, 2, 2)
    # (b, m, i, j, qh, qw) -> (b, m, i, qh, j, qw) = (B, M, H, W)
    m = jnp.transpose(m, (0, 1, 2, 4, 3, 5))
    return m.reshape(B, M, 2 * Hb, 2 * Wb)


def s2d_maps_to_transposed(m: jnp.ndarray) -> jnp.ndarray:
    """s2d-form maps -> the min-path's ``(B, M, W, H)`` orientation."""
    B, M, Hb, Wb, _ = m.shape
    m = m.reshape(B, M, Hb, Wb, 2, 2)
    # (b, m, i, j, qh, qw) -> (b, m, j, qw, i, qh) = (B, M, W, H)
    m = jnp.transpose(m, (0, 1, 3, 5, 2, 4))
    return m.reshape(B, M, 2 * Wb, 2 * Hb)


@functools.partial(jax.jit, static_argnames=("image_height",))
def repair_segs(segs: jnp.ndarray, image_height: int) -> jnp.ndarray:
    """Replace invalid boundary rows (NaN or 0) with the first *originally*
    valid boundary below, or ``image_height`` if none — the repair loop of
    reference `common/dataset_construction.py:677-692`.

    Args:
      segs: ``(..., num_boundaries, W)`` boundary rows (float or int).

    Returns:
      int32 segs of the same shape with invalid entries repaired.
    """
    segs_f = segs.astype(jnp.float32)
    invalid = jnp.isnan(segs_f) | (segs_f == 0)
    num_boundaries = segs.shape[-2]
    fill = jnp.full(segs_f.shape[:-2] + segs_f.shape[-1:], float(image_height))
    repaired = [None] * num_boundaries
    below = fill
    # Unrolled bottom-up: each invalid entry takes the nearest valid
    # *original* value below it (already-repaired values below resolve to
    # exactly that, since repairs only ever propagate original values).
    for i in range(num_boundaries - 1, -1, -1):
        repaired[i] = jnp.where(invalid[..., i, :], below, segs_f[..., i, :])
        below = repaired[i]
    return jnp.stack(repaired, axis=-2).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("image_height",))
def create_area_mask(segs: jnp.ndarray, image_height: int) -> jnp.ndarray:
    """Dense region mask from (possibly invalid) boundary rows.

    Exactly replicates the sequential write semantics of reference
    `common/dataset_construction.py:694-706`: region ``i`` is written over
    rows ``[seg_{i-1}, seg_i)`` in boundary order (later writes win when
    repaired boundaries are out of order), then rows ``>= seg_{n-1}`` get
    region ``n``.

    Args:
      segs: ``(..., num_boundaries, W)`` boundary rows; NaN/0 invalid.
      image_height: H of the output mask.

    Returns:
      uint8 mask ``(..., H, W)`` in image (row, col) orientation. (The
      reference produces the transposed ``(W, H)`` mask and transposes it
      back downstream — `evaluation/evaluation.py:377`.)
    """
    segs = repair_segs(segs, image_height)
    num_boundaries = segs.shape[-2]
    rows = jnp.arange(image_height, dtype=jnp.int32)[:, None]  # (H, 1)
    mask = jnp.zeros(segs.shape[:-2] + (image_height, segs.shape[-1]), jnp.uint8)
    prev = jnp.zeros_like(segs[..., 0, :])
    for i in range(num_boundaries):
        cur = segs[..., i, :]
        write = (rows >= prev[..., None, :]) & (rows < cur[..., None, :])
        mask = jnp.where(write, jnp.uint8(i), mask)
        prev = cur
    mask = jnp.where(rows >= prev[..., None, :], jnp.uint8(num_boundaries), mask)
    return mask
