"""StableHLO deployment artifacts (common/export.py): round trip,
bit-parity with the live pipeline, validation errors, CLI surface.

Beyond-reference capability (the reference serves from Keras HDF5 +
the full TF stack, `common/utils.py:26-70`); exports pin the portable
XLA min-path backend so the artifact contains no Pallas custom calls.
"""

import json

import h5py
import jax
import numpy as np
import pytest

from oct_image_segmentation_models_tpu.common.export import (
    EXPORT_FORMAT_VERSION,
    export_inference_pipeline,
    load_exported_pipeline,
)
from oct_image_segmentation_models_tpu.common.model_io import (
    load_model_and_config,
    save_model,
)
from oct_image_segmentation_models_tpu.models import get_model_class
from oct_image_segmentation_models_tpu.ops.inference import (
    make_fused_pipeline,
)

H = W = 32


@pytest.fixture(scope="module")
def unet_checkpoint(tmp_path_factory):
    root = tmp_path_factory.mktemp("export_model")
    cfg = dict(
        input_channels=1, num_classes=3, image_height=H, image_width=W,
        start_neurons=2, pool_layers=2,
    )
    container = get_model_class("unet")(**cfg)
    module = container.build_model()
    variables = module.init(
        jax.random.PRNGKey(0), np.zeros((1, H, W, 1), np.float32),
        training=False,
    )
    path = root / "model.hdf5"
    save_model(path, "unet", container.get_config(), dict(variables))
    return path


def _images(batch=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (batch, H, W, 1), np.uint8)


def test_export_round_trip_bit_matches_live_pipeline(
    unet_checkpoint, tmp_path
):
    out = export_inference_pipeline(
        unet_checkpoint, tmp_path / "exported.hdf5", batch_size=2
    )
    ep = load_exported_pipeline(out)
    assert ep.metadata["model_name"] == "unet"
    assert ep.metadata["optimized_forward"] == "s2d"
    assert ep.metadata["platforms"] == ["cpu", "tpu"]
    assert ep.input_shape == (2, H, W, 1)

    imgs = _images()
    labels, maps, delins = ep(imgs)

    loaded, cfg = load_model_and_config(unet_checkpoint)
    from oct_image_segmentation_models_tpu.ops.s2d_unet import (
        maybe_build_s2d_apply,
    )

    labels_fn, _ = maybe_build_s2d_apply(
        loaded.module, loaded.variables, cfg, output="labels_s2d"
    )
    container = get_model_class("unet")(**cfg)
    # match the export surface's default tie mode ("fast") — the claim
    # under test is exported == live for the SAME configuration
    direct = make_fused_pipeline(
        loaded.module,
        container.get_preprocess_input_fn(),
        minpath_backend="xla",
        minpath_tie_parity="fast",
        labels_apply_fn=labels_fn,
        num_classes=loaded.output_classes,
    )
    dl, dm, dd = direct(loaded.variables, imgs)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(dl))
    np.testing.assert_array_equal(np.asarray(maps), np.asarray(dm))
    np.testing.assert_array_equal(np.asarray(delins), np.asarray(dd))


def test_export_parity_forward_and_toggles(unet_checkpoint, tmp_path):
    out = export_inference_pipeline(
        unet_checkpoint,
        tmp_path / "parity.hdf5",
        batch_size=1,
        optimize=False,
        with_graph_search=False,
        return_maps=False,
        platforms=("cpu",),
    )
    ep = load_exported_pipeline(out)
    assert ep.metadata["optimized_forward"] == "parity"
    labels, maps, delins = ep(_images(1))
    assert np.asarray(labels).shape == (1, H, W)
    assert maps is None and delins is None


def test_export_symbolic_batch(unet_checkpoint, tmp_path):
    """batch_size=None lowers a symbolic batch dim: one artifact serves
    any batch size, bit-identical to the live pipeline at each."""
    out = export_inference_pipeline(
        unet_checkpoint, tmp_path / "dyn.hdf5", batch_size=None
    )
    ep = load_exported_pipeline(out)
    assert ep.input_shape == (None, H, W, 1)

    loaded, cfg = load_model_and_config(unet_checkpoint)
    from oct_image_segmentation_models_tpu.ops.s2d_unet import (
        maybe_build_s2d_apply,
    )

    labels_fn, _ = maybe_build_s2d_apply(
        loaded.module, loaded.variables, cfg, output="labels_s2d"
    )
    container = get_model_class("unet")(**cfg)
    # match the export surface's default tie mode ("fast") — the claim
    # under test is exported == live for the SAME configuration
    direct = make_fused_pipeline(
        loaded.module,
        container.get_preprocess_input_fn(),
        minpath_backend="xla",
        minpath_tie_parity="fast",
        labels_apply_fn=labels_fn,
        num_classes=loaded.output_classes,
    )
    for batch in (1, 3):
        imgs = _images(batch, seed=batch)
        labels, _maps, delins = ep(imgs)
        dl, _dm, dd = direct(loaded.variables, imgs)
        np.testing.assert_array_equal(np.asarray(labels), np.asarray(dl))
        np.testing.assert_array_equal(np.asarray(delins), np.asarray(dd))

    with pytest.raises(ValueError, match="lowered for input shape"):
        ep(np.zeros((2, H, W // 2, 1), np.uint8))


def test_export_deeplab_folded_forward(tmp_path):
    """DeepLabV3+ exports through the BN-folded fast path and the
    artifact's labels match the live folded pipeline."""
    cfg = dict(
        input_channels=3, num_classes=3, image_height=64, image_width=64
    )
    container = get_model_class("deeplabv3plus")(**cfg)
    module = container.build_model()
    variables = module.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32),
        training=False,
    )
    path = tmp_path / "deeplab.hdf5"
    save_model(path, "deeplabv3plus", container.get_config(), dict(variables))

    out = export_inference_pipeline(
        path,
        tmp_path / "deeplab_exported.hdf5",
        batch_size=1,
        with_graph_search=False,
        return_maps=False,
        platforms=("cpu",),
    )
    ep = load_exported_pipeline(out)
    assert ep.metadata["optimized_forward"] == "folded"

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (1, 64, 64, 3), np.uint8)
    labels, maps, delins = ep(imgs)
    assert maps is None and delins is None

    from oct_image_segmentation_models_tpu.models.deeplabv3plus import (
        maybe_build_folded_apply,
    )

    loaded, lcfg = load_model_and_config(path)
    fold_fn, folded_vars = maybe_build_folded_apply(
        loaded.module, loaded.variables
    )
    direct = make_fused_pipeline(
        loaded.module,
        container.get_preprocess_input_fn(),
        with_graph_search=False,
        return_maps=False,
        minpath_backend="xla",
        apply_fn=fold_fn,
    )
    dl, _dm, _dd = direct(folded_vars, imgs)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(dl))


def test_export_deeplab_geometry_guard(tmp_path):
    """DeepLabV3+ has no pool_layers attr — the guard must still catch
    dims its decoder concat cannot trace (H/W not divisible by 4) instead
    of failing mid-trace with an opaque XLA concat shape error."""
    cfg = dict(
        input_channels=3, num_classes=3, image_height=64, image_width=64
    )
    container = get_model_class("deeplabv3plus")(**cfg)
    module = container.build_model()
    variables = module.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32),
        training=False,
    )
    path = tmp_path / "deeplab.hdf5"
    save_model(path, "deeplabv3plus", container.get_config(), dict(variables))
    with pytest.raises(ValueError, match="multiple of 4"):
        export_inference_pipeline(
            path,
            tmp_path / "exported.hdf5",
            batch_size=1,
            image_height=66,
            image_width=64,
            platforms=("cpu",),
        )


def test_export_input_validation(unet_checkpoint, tmp_path):
    out = export_inference_pipeline(
        unet_checkpoint, tmp_path / "exported.hdf5", batch_size=2
    )
    ep = load_exported_pipeline(out)
    with pytest.raises(ValueError, match="lowered for input shape"):
        ep(_images(1))

    with pytest.raises(ValueError, match="multiple of"):
        export_inference_pipeline(
            unet_checkpoint,
            tmp_path / "bad_geom.hdf5",
            image_height=30,  # not divisible by 2**pool_layers
            image_width=W,
        )

    # compute_dtype is only honored by the optimized fast paths —
    # silently exporting a float32 parity forward would misreport the
    # accuracy/memory tradeoff (same guard as VolumeSegmenter)
    with pytest.raises(ValueError, match="compute_dtype"):
        export_inference_pipeline(
            unet_checkpoint,
            tmp_path / "bf16_parity.hdf5",
            optimize=False,
            compute_dtype="bfloat16",
        )


def test_export_rejects_non_uint8_pixels(unet_checkpoint, tmp_path):
    """The artifact embeds the preprocessing, so it consumes RAW uint8
    pixels — a normalized float input must raise, not be silently
    astype-truncated to all zeros; lossless integer inputs still work."""
    out = export_inference_pipeline(
        unet_checkpoint, tmp_path / "exported.hdf5", batch_size=2
    )
    ep = load_exported_pipeline(out)
    imgs = _images()

    with pytest.raises(ValueError, match="raw uint8 images"):
        ep(imgs.astype(np.float32) / 255.0)

    with pytest.raises(ValueError, match=r"outside \[0, 255\]"):
        ep(imgs.astype(np.int32) - 300)

    # int64 values in [0, 255] are losslessly representable — accepted
    # and bit-identical to the uint8 call
    labels_a, _, _ = ep(imgs)
    labels_b, _, _ = ep(imgs.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(labels_a), np.asarray(labels_b))


def test_export_artifact_format_checks(unet_checkpoint, tmp_path):
    not_artifact = tmp_path / "not_artifact.hdf5"
    with h5py.File(not_artifact, "w") as fh:
        fh.create_dataset("x", data=np.zeros(3))
    with pytest.raises(ValueError, match="not an octseg export artifact"):
        load_exported_pipeline(not_artifact)

    out = export_inference_pipeline(
        unet_checkpoint, tmp_path / "exported.hdf5", batch_size=1
    )
    with h5py.File(out, "r+") as fh:
        meta = json.loads(fh.attrs["octseg_export"])
        meta["format_version"] = EXPORT_FORMAT_VERSION + 1
        fh.attrs["octseg_export"] = json.dumps(meta)
    with pytest.raises(ValueError, match="unsupported export format"):
        load_exported_pipeline(out)


def test_export_cli(unet_checkpoint, tmp_path, capsys):
    from oct_image_segmentation_models_tpu.cli import main

    out = tmp_path / "cli_export.hdf5"
    main(
        [
            "export", str(unet_checkpoint), str(out),
            "--batch-size", "1", "--platforms", "cpu",
            "--minpath-tie-parity", "fast",
        ]
    )
    assert "Exported StableHLO" in capsys.readouterr().out
    ep = load_exported_pipeline(out)
    assert ep.metadata["minpath_tie_parity"] == "fast"
    labels, maps, delins = ep(_images(1))
    assert np.asarray(delins).shape == (1, 2, W)
