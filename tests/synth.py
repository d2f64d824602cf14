"""Synthetic layered-OCT dataset helpers for tests and benchmarks."""

from __future__ import annotations

import numpy as np


def make_layered_sample(rng, h, w, num_classes, noise=8.0):
    """One B-scan-like image + dense labels with smooth layer boundaries."""
    labels = np.zeros((h, w), dtype=np.uint8)
    boundaries = []
    lo = 2
    for cls in range(1, num_classes):
        lo = lo + max(2, (h - lo) // (num_classes - cls + 1) // 2)
        base = rng.integers(lo, lo + max(2, h // (2 * num_classes)))
        wiggle = np.cumsum(rng.integers(-1, 2, size=w))
        b = np.clip(base + wiggle - wiggle.mean(), 1, h - 2).astype(int)
        boundaries.append(b)
        lo = int(b.mean())
    boundaries = np.sort(np.stack(boundaries), axis=0)  # keep layered order
    rows = np.arange(h)[:, None]
    for i, b in enumerate(boundaries):
        labels[rows >= b[None, :]] = i + 1
    # intensity differs per layer + noise
    levels = np.linspace(40, 220, num_classes)
    image = levels[labels] + rng.normal(0, noise, size=(h, w))
    image = np.clip(image, 0, 255).astype(np.uint8)
    return image, labels, boundaries


def make_dataset(path, n_train=6, n_val=2, n_test=2, h=32, w=48, num_classes=3,
                 seed=0):
    """Write a reference-schema HDF5 dataset; returns the path."""
    import h5py

    rng = np.random.default_rng(seed)

    def split(n):
        images, labels = [], []
        for _ in range(n):
            img, lab, _ = make_layered_sample(rng, h, w, num_classes)
            images.append(img)
            labels.append(lab)
        images = np.stack(images)[..., None]
        labels = np.stack(labels)[..., None]
        return images, labels

    with h5py.File(path, "w") as f:
        for name, n in (("train", n_train), ("val", n_val), ("test", n_test)):
            images, labels = split(n)
            f[f"{name}_images"] = images
            f[f"{name}_labels"] = labels
        f["test_images_source"] = np.array(
            [f"synthetic_{i}.png".encode("ascii") for i in range(n_test)]
        )
    return path
