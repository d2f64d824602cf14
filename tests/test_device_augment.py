"""On-device augmentations vs the host implementations."""

import jax
import numpy as np

from oct_image_segmentation_models_tpu.common import augmentation as host_aug
from oct_image_segmentation_models_tpu.ops import augment as dev_aug


def test_flip_matches_host():
    rng = np.random.default_rng(0)
    images = rng.random((3, 8, 6, 1)).astype(np.float32)
    labels = rng.integers(0, 3, (3, 8, 6, 1)).astype(np.int32)
    for flip_type in ("up-down", "left-right"):
        gi, gl = dev_aug.flip(images, labels, flip_type)
        for s in range(3):
            hi, hl = host_aug.flip_aug(
                images[s], labels[s], {"flip_type": flip_type}
            )
            assert np.array_equal(np.asarray(gi)[s], hi)
            assert np.array_equal(np.asarray(gl)[s], hl)


def test_gaussian_noise_distribution():
    rng = np.random.default_rng(1)
    images = np.full((4, 32, 32, 1), 0.5, np.float32)
    out = np.asarray(
        dev_aug.add_gaussian_noise(jax.random.PRNGKey(0), images, 0.0, 0.01)
    )
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert abs(out.std() - 0.1) < 0.02
    assert abs(out.mean() - 0.5) < 0.01


def test_random_flip_probability():
    images = np.zeros((64, 4, 4, 1), np.float32)
    images[:, 0, 0, 0] = 1.0  # marker at top-left
    labels = images.copy()
    gi, gl = dev_aug.random_flip(
        jax.random.PRNGKey(2), images, labels, "up-down", p=0.5
    )
    flipped = np.asarray(gi)[:, -1, 0, 0] == 1.0
    assert 10 < flipped.sum() < 54  # ~half the samples flipped
    assert np.array_equal(np.asarray(gi), np.asarray(gl))
