"""On-device augmentations (jax) mirroring :mod:`..common.augmentation`.

The host generator applies numpy augmentations per sample (reference
semantics); these batched jnp equivalents let the whole augment step run
on device inside the input pipeline — images are [0, 1] floats, labels
ride along untouched except for flips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flip(images, labels, flip_type: str = "left-right"):
    """Batched flip; axis semantics match reference `augmentation.py:51-69`
    (axis 0 = up-down, axis 1 = left-right, per sample)."""
    axis = 1 if flip_type == "up-down" else 2
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
    axis = 1 if flip_type == "up-down" else 2
    coins = jax.random.bernoulli(rng, p, (images.shape[0],))
    shape_i = (-1,) + (1,) * (images.ndim - 1)
    flipped_i = jnp.flip(images, axis=axis)
    flipped_l = jnp.flip(labels, axis=axis)
    sel = coins.reshape(shape_i)
    images = jnp.where(sel, flipped_i, images)
    labels = jnp.where(coins.reshape((-1,) + (1,) * (labels.ndim - 1)),
                       flipped_l, labels)
    return images, labels
