"""Data generator, loaders, augmentations, dataset construction."""

import h5py
import numpy as np
import pytest

from oct_image_segmentation_models_tpu.common import augmentation as aug
from oct_image_segmentation_models_tpu.common import dataset_construction as dc
from oct_image_segmentation_models_tpu.common import dataset_loader as dl
from oct_image_segmentation_models_tpu.common.data_generator import (
    BatchGenerator,
    DataGenerator,
)

from synth import make_dataset


def _images(n=5, h=8, w=6, c=1, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, 256, size=(n, h, w, c), dtype=np.uint8),
        rng.integers(0, 3, size=(n, h, w, 1), dtype=np.uint8),
    )


def test_batchgen_none_mode_batches_and_epochs():
    images, labels = _images()
    gen = BatchGenerator(
        images, labels, 2, [], "none", (), False, lambda x: x / 255.0, seed=1
    )
    assert gen.num_batches == 2  # floor(5/2), remainder dropped
    b1_imgs, b1_labels = gen.get_batch_list()
    assert b1_imgs.shape == (2, 8, 6, 1)
    assert b1_imgs.dtype == np.float32
    assert b1_imgs.max() <= 1.0  # preprocess applied to de-normalized pixels
    assert b1_labels.shape == (2, 8, 6, 1)


def test_batchgen_aug_modes_require_augmentations():
    """aug_mode='one'/'all' with an empty augmentation list fails at
    CONSTRUCTION — 'one' would otherwise crash inside rng.choice at the
    first batch and 'all' would yield zero samples per epoch, both after
    dataset loading and a slow remote compile."""
    import pytest

    images, labels = _images()
    for mode in ("one", "all"):
        with pytest.raises(ValueError, match="non-empty augmentations"):
            BatchGenerator(
                images, labels, 2, [], mode, (), True,
                lambda x: x / 255.0, seed=1,
            )


def test_batchgen_aug_probs_validated_at_construction():
    """aug_mode='one' probability errors fail at CONSTRUCTION (r5 review
    finding): a length mismatch or non-normalized probs previously only
    crashed inside the first batch's rng.choice, and a numpy-array
    aug_probs died on `self.aug_probs or None`'s ambiguous truth."""
    from oct_image_segmentation_models_tpu.common.augmentation import (
        flip_aug,
    )

    images, labels = _images()
    augs = [
        (flip_aug, {"flip_type": "up-down"}),
        (flip_aug, {"flip_type": "left-right"}),
    ]
    with pytest.raises(ValueError, match="entries for"):
        BatchGenerator(
            images, labels, 2, augs, "one", (0.5, 0.25, 0.25), True,
            lambda x: x / 255.0, seed=1,
        )
    with pytest.raises(ValueError, match="sum to 1"):
        BatchGenerator(
            images, labels, 2, augs, "one", (0.5, 0.4), True,
            lambda x: x / 255.0, seed=1,
        )
    # numpy-array aug_probs works (coerced to a tuple) and draws fine
    gen = BatchGenerator(
        images, labels, 2, augs, "one", np.array([0.75, 0.25]), True,
        lambda x: x / 255.0, seed=1,
    )
    gen.get_batch_list()


def test_batchgen_all_mode_doubles_samples():
    images, labels = _images()
    fn_args = [
        (aug.flip_aug, {"flip_type": "left-right"}),
        (aug.no_aug, {}),
    ]
    gen = BatchGenerator(
        images, labels, 2, fn_args, "all", (), True, lambda x: x, seed=1
    )
    assert gen.total_samples == 10
    assert gen.num_batches == 5
    imgs, labs = gen.get_batch_list()
    # consecutive samples are the augmentations of the same raw image:
    # flip then identity
    assert np.allclose(imgs[0], np.flip(imgs[1], axis=1))


def test_batchgen_one_mode_probabilities():
    images, labels = _images()
    fn_args = [
        (aug.no_aug, {}),
        (aug.flip_aug, {"flip_type": "up-down"}),
    ]
    gen = BatchGenerator(
        images, labels, 2, fn_args, "one", (1.0, 0.0), True, lambda x: x,
        seed=1,
    )
    assert gen.total_samples == 5
    imgs, _ = gen.get_batch_list()  # p=(1,0) -> always no_aug
    assert imgs.shape == (2, 8, 6, 1)


def test_batchgen_epoch_reshuffle_changes_order():
    images, labels = _images(n=8)
    gen = BatchGenerator(
        images, labels, 8, [], "none", (), False, lambda x: x, seed=3
    )
    first = gen.sample_shuffle.copy()
    gen.handle_epoch_end()
    assert not np.array_equal(first, gen.sample_shuffle)
    # no shuffle mode keeps identity order
    gen2 = BatchGenerator(
        images, labels, 8, [], "none", (), False, lambda x: x, shuffle=False
    )
    assert np.array_equal(gen2.sample_shuffle, np.arange(8))


def test_datagenerator_iterates_all_batches():
    images, labels = _images(n=6)
    gen = DataGenerator(
        images, labels, 2, [], "none", (), False, lambda x: x, seed=0
    )
    assert len(gen) == 3
    batches = list(gen)
    assert len(batches) == 3


def test_batchgen_noise_reproducible_with_seed():
    """Stochastic augs draw from the generator's seeded RNG stream —
    two generators with the same seed must emit bitwise-identical noisy
    batches (the stream is part of get_state(), so this is also what
    makes exact resume possible with noise augs)."""
    fn_args = [(aug.add_noise_aug, {"mode": "gaussian", "variance": 0.01})]

    def batches(seed):
        images, labels = _images()
        gen = BatchGenerator(
            images, labels, 2, fn_args, "all", (), True, lambda x: x,
            seed=seed,
        )
        return [gen.get_batch_list()[0] for _ in range(gen.num_batches)]

    a, b, c = batches(3), batches(3), batches(4)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_noise_modes():
    rng = np.random.default_rng(0)
    img = rng.random((8, 8))
    for mode in ("gaussian", "speckle", "salt", "pepper", "s&p"):
        out, _ = aug.add_noise_aug(
            img, None, {"mode": mode, "mean": 0, "variance": 0.01,
                        "rng": np.random.default_rng(1)}
        )
        assert out.shape == img.shape
        assert out.min() >= 0.0 and out.max() <= 1.0
    desc = aug.add_noise_aug(None, None, {"mode": "gaussian"}, desc_only=True)
    assert desc.startswith("add noise")


def test_loader_segs_schema(tmp_path):
    # README-style *_segs boundary arrays synthesize dense labels
    path = tmp_path / "segs.hdf5"
    h_img, w_img = 10, 6
    segs = np.array([[[3] * w_img, [7] * w_img]], dtype=np.uint16)  # (1,2,W)
    with h5py.File(path, "w") as f:
        f["train_images"] = np.zeros((1, h_img, w_img, 1), np.uint8)
        f["train_segs"] = segs
    with h5py.File(path, "r") as f:
        images, labels = dl.load_training_data(f)
    assert labels.shape == (1, h_img, w_img, 1)
    col = labels[0, :, 0, 0]
    assert list(col[:3]) == [0, 0, 0]
    assert list(col[3:7]) == [1, 1, 1, 1]
    assert list(col[7:]) == [2, 2, 2]


def test_create_area_mask_reference_orientation():
    segs = np.array([[2.0, 0.0], [5.0, 5.0]])  # boundary 0 invalid in col 1
    mask = dc.create_area_mask((2, 8, 1), segs)  # (W, H, 1)
    assert mask.shape == (2, 8, 1)
    col0 = mask[0, :, 0]
    assert list(col0) == [0, 0, 1, 1, 1, 2, 2, 2]
    col1 = mask[1, :, 0]  # repaired: boundary0 -> 5
    assert list(col1) == [0, 0, 0, 0, 0, 2, 2, 2]


def test_construct_dataset_fullsize(tmp_path):
    import time

    images = np.zeros((2, 6, 8), np.uint8)
    labels = np.zeros((2, 6, 8), np.uint8)
    segs = np.zeros((2, 2, 6), np.uint16)
    fname = dc.construct_dataset(
        images=images,
        labels=labels,
        segs=segs,
        write_filename="unit",
        trainvaltest="train",
        boundary_names=np.array([b"ilm", b"csi"]),
        area_names=None,
        patch_class_names=None,
        fullsize_class_names=None,
        image_names=None,
        start_construct_time=time.time(),
        patches=False,
        patch_labels=None,
        patch_col_range=range(6),
        patch_size=None,
        num_boundaries=2,
        num_areas=3,
        num_channels=1,
        dim_ordering="channels_last",
        dim_names="n,w,h",
        alt_output=str(tmp_path) + "/",
    )
    with h5py.File(fname, "r") as f:
        assert f.attrs["type"] == b"fullsize"
        assert f["images"].shape == (2, 6, 8, 1)
        assert f["segs"].shape == (2, 2, 6)
        assert f["boundary_names"][0] == b"ilm"


def test_patch_tooling():
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (8, 12)).astype(np.uint8)  # (W, H)
    segs = np.array([[4] * 8, [8] * 8])
    pl = dc.create_patch_labels(image, segs)
    assert pl.shape == (8, 12)
    assert pl[0, 4] == 1 and pl[0, 8] == 2
    patches, labels = dc.sample_training_patches(
        image, segs, range(8), (3, 3), rng=np.random.default_rng(1)
    )
    assert len(patches) == len(labels) == 8 * 3  # 2 boundaries + 1 bg per col
    p, l, t = dc.construct_patches_whole_image(image, pl, (4, 4))
    assert p.shape == (8 * 12, 4, 4, 1)


def test_flatten_and_roll():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (6, 10, 1)).astype(np.uint8)
    boundary = np.array([3, 4, 5, 4, 3, 2])
    flat, offsets, fb = dc.flatten_image_boundary(img.copy(), boundary)
    assert flat.shape == img.shape
    assert offsets.shape == (6,)
    rolled = dc.roll_image_offset(img.copy()[:, :, 0], -offsets)
    assert rolled.shape == (6, 10)
