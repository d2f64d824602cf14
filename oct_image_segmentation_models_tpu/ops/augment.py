"""On-device augmentations (jax) mirroring :mod:`..common.augmentation`.

The host generator applies numpy augmentations per sample (reference
semantics); these batched jnp equivalents let the whole augment step run
on device inside the input pipeline — images are [0, 1] floats, labels
ride along untouched except for flips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flip_axis(flip_type: str) -> int:
    """Batch-array axis for a flip type; unknown names raise exactly as
    the host ``flip_aug`` does (`common/augmentation.py:36`) so the
    device path cannot silently run a different augmentation."""
    if flip_type == "up-down":
        return 1
    if flip_type == "left-right":
        return 2
    raise ValueError(f"Unknown flip_type: {flip_type}")


def flip(images, labels, flip_type: str = "left-right"):
    """Batched flip; axis semantics match reference `augmentation.py:51-69`
    (axis 0 = up-down, axis 1 = left-right, per sample)."""
    axis = _flip_axis(flip_type)
    return jnp.flip(images, axis=axis), jnp.flip(labels, axis=axis)


def add_gaussian_noise(rng, images, mean: float = 0.0, variance: float = 0.01):
    """skimage ``random_noise(mode='gaussian')`` semantics on [0, 1] images:
    additive N(mean, sqrt(var)) then clip."""
    noise = mean + jnp.sqrt(variance) * jax.random.normal(
        rng, images.shape, images.dtype
    )
    return jnp.clip(images + noise, 0.0, 1.0)


def add_speckle_noise(rng, images, mean: float = 0.0, variance: float = 0.01):
    """skimage ``random_noise(mode='speckle')``: x + x*N(mean, sqrt(var))."""
    noise = mean + jnp.sqrt(variance) * jax.random.normal(
        rng, images.shape, images.dtype
    )
    return jnp.clip(images + images * noise, 0.0, 1.0)


def random_flip(rng, images, labels, flip_type: str = "left-right", p=0.5):
    """Flip each sample independently with probability ``p``."""
    axis = _flip_axis(flip_type)
    coins = jax.random.bernoulli(rng, p, (images.shape[0],))
    shape_i = (-1,) + (1,) * (images.ndim - 1)
    flipped_i = jnp.flip(images, axis=axis)
    flipped_l = jnp.flip(labels, axis=axis)
    sel = coins.reshape(shape_i)
    images = jnp.where(sel, flipped_i, images)
    labels = jnp.where(coins.reshape((-1,) + (1,) * (labels.ndim - 1)),
                       flipped_l, labels)
    return images, labels


def build_device_augmenter(aug_fn_args):
    """Per-sample device augmentation for the training input pipeline.

    ``aug_fn_args`` is the generator's resolved list of (host aug fn,
    arg dict) pairs (``common/augmentation.py`` registry entries). When
    every requested augmentation has a device equivalent, returns

        ``apply(rng, images, labels, choices) -> (images, labels)``

    where ``choices`` is ``(B,) int32`` — the per-sample augmentation
    index chosen by the host generator's mode logic (none/one/all), or
    -1 for "no augmentation". Images are the generator's [0, 1] floats.
    Returns ``None`` when any augmentation lacks a device equivalent
    (e.g. salt/pepper noise) — the caller falls back to host augs.
    """
    from ..common.augmentation import add_noise_aug, flip_aug, no_aug

    # Every branch is applied to the WHOLE batch, then per-sample masks
    # select the generator's choice. With <= a handful of augmentations
    # this is a few fused elementwise passes (~1 ms at the flagship
    # shape); the per-sample alternative (vmap over lax.switch) lowers
    # to ~25 ms of sequentialised control flow on TPU.
    branches = []  # fn(rng, images, labels) -> (images, labels), batched
    for fn, arg in aug_fn_args:
        if fn is flip_aug:
            axis = _flip_axis(arg["flip_type"])

            def mk_flip(axis=axis):
                def b(rng, img, lab):
                    return jnp.flip(img, axis=axis), jnp.flip(lab, axis=axis)

                return b

            branches.append(mk_flip())
        elif fn is add_noise_aug and arg.get("mode") in (
            "gaussian",
            "speckle",
        ):
            mode = arg["mode"]
            mean = float(arg.get("mean", 0.0))
            var = float(arg.get("variance", 0.01))

            def mk_noise(mode=mode, mean=mean, var=var):
                def b(rng, img, lab):
                    noise = mean + jnp.sqrt(var) * jax.random.normal(
                        rng, img.shape, img.dtype
                    )
                    out = img + (img * noise if mode == "speckle" else noise)
                    return jnp.clip(out, 0.0, 1.0), lab

                return b

            branches.append(mk_noise())
        elif fn is no_aug:
            branches.append(lambda rng, img, lab: (img, lab))
        else:
            return None

    @jax.jit
    def apply(rng, images, labels, choices):
        rngs = jax.random.split(rng, len(branches))
        out_i, out_l = images, labels
        for k, b in enumerate(branches):
            bi, bl = b(rngs[k], images, labels)
            sel_i = (choices == k).reshape((-1,) + (1,) * (images.ndim - 1))
            sel_l = (choices == k).reshape((-1,) + (1,) * (labels.ndim - 1))
            out_i = jnp.where(sel_i, bi, out_i)
            out_l = jnp.where(sel_l, bl, out_l)
        return out_i, out_l

    return apply
