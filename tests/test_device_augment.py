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


def test_build_device_augmenter_matches_host_choices():
    import jax
    import numpy as np

    from oct_image_segmentation_models_tpu.common.augmentation import (
        add_noise_aug,
        augmentation_map,
        flip_aug,
    )
    from oct_image_segmentation_models_tpu.ops.augment import (
        build_device_augmenter,
    )

    aug_fn_args = [
        (flip_aug, {"flip_type": "left-right"}),
        (flip_aug, {"flip_type": "up-down"}),
        (add_noise_aug, {"mode": "gaussian", "mean": 0, "variance": 0.01}),
    ]
    apply = build_device_augmenter(aug_fn_args)
    assert apply is not None

    rng = np.random.default_rng(0)
    images = rng.random((5, 8, 12, 1)).astype(np.float32)
    labels = rng.integers(0, 3, (5, 8, 12, 1)).astype(np.float32)
    choices = np.array([0, 1, 2, -1, 0], np.int32)
    out_i, out_l = apply(jax.random.PRNGKey(0), images, labels, choices)
    out_i, out_l = np.asarray(out_i), np.asarray(out_l)

    # flips and identity are bit-exact vs the host augs
    for k in (0, 1, 4):
        want_i, want_l = aug_fn_args[choices[k]][0](
            images[k], labels[k], aug_fn_args[choices[k]][1]
        )
        assert np.array_equal(out_i[k], want_i)
        assert np.array_equal(out_l[k], want_l)
    assert np.array_equal(out_i[3], images[3])
    # noise sample: right moments, labels untouched
    d = out_i[2] - images[2]
    assert abs(float(d.mean())) < 0.02 and 0.05 < float(d.std()) < 0.15
    assert np.array_equal(out_l[2], labels[2])

    # unsupported mode -> no device augmenter
    assert (
        build_device_augmenter(
            [(add_noise_aug, {"mode": "salt", "variance": 0.05})]
        )
        is None
    )
    assert (
        build_device_augmenter([(augmentation_map["no_augmentation"], {})])
        is not None
    )


def test_train_model_aug_device(tmp_path):
    import h5py
    import numpy as np

    from oct_image_segmentation_models_tpu.training import (
        TrainingParams,
        train_model,
    )

    from synth import make_dataset

    ds = make_dataset(tmp_path / "ds.hdf5", n_train=6, n_val=4, n_test=2,
                      h=16, w=16)
    kwargs = dict(
        model_architecture="unet",
        training_dataset_path=ds,
        initial_model=None,
        results_location=tmp_path,
        opt_con="adam",
        loss="dice_loss_macro",
        metric="dice_coef_macro",
        epochs=2,
        batch_size=2,
        model_hyperparameters={"start_neurons": 2, "pool_layers": 2},
        seed=0,
        augmentations=[
            {"name": "flip", "arguments": {"flip_type": "left-right"}},
            {"name": "add_noise",
             "arguments": {"mode": "gaussian", "mean": 0, "variance": 0.01}},
        ],
        aug_mode="all",
        aug_fly=True,
    )
    folder = train_model(TrainingParams(**kwargs), None)
    with h5py.File(folder / "stats_epoch02.hdf5", "r") as f:
        assert np.isfinite(f["train_loss"][()]).all()

    # unsupported aug + aug_device='on' -> clear error
    import pytest

    bad = dict(kwargs)
    bad["augmentations"] = [
        {"name": "add_noise", "arguments": {"mode": "salt", "variance": 0.05}}
    ]
    bad["aug_device"] = "on"
    with pytest.raises(ValueError, match="device"):
        train_model(TrainingParams(**bad), None)
