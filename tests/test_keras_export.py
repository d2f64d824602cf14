"""Keras weight EXPORT — the reverse migration path.

``model_io.save_keras_weights`` writes a Flax model's weights as a
Keras-format HDF5 that (a) this framework's own Keras importer reads
back bit-exactly and (b) REAL Keras consumes via ``model.load_weights``
on the reference's own ``build_model()`` architecture — proving a model
trained here can migrate back to the reference (TF/Keras) ecosystem.

Reference anchors: checkpoint layout `training/training.py:319-326`,
U-Net build order `models/unet.py:106-147`, DeepLabV3+ backbone tap
`models/deeplabv3plus.py:91-95`.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
from tensorflow import keras  # noqa: E402

import jax  # noqa: E402

from oct_image_segmentation_models_tpu.common import model_io  # noqa: E402
from oct_image_segmentation_models_tpu.models import (  # noqa: E402
    get_model_class,
)
from test_keras_parity import _import_reference_model_class  # noqa: E402


def _randomized_variables(module, model_config, seed):
    """Init + perturb: fresh BN stats are identity (mean 0 / var 1) and
    biases zero, which would let a transposed or dropped weight pass the
    round trip unnoticed."""
    variables = module.init(
        jax.random.PRNGKey(seed),
        np.zeros(
            (
                1,
                model_config["image_height"],
                model_config["image_width"],
                model_config["input_channels"],
            ),
            np.float32,
        ),
        training=False,
    )
    rng = np.random.RandomState(seed)
    flat = model_io._flatten_tree(dict(variables))
    out = {}
    for key, value in flat.items():
        if key.endswith("/var"):
            out[key] = rng.uniform(0.8, 1.2, value.shape).astype(np.float32)
        elif key.endswith(("/mean", "/bias", "/scale")):
            out[key] = rng.normal(0.0, 0.05, value.shape).astype(np.float32)
        else:
            out[key] = value
    return model_io._unflatten(out)


def _assert_tree_equal(a, b):
    fa, fb = model_io._flatten_tree(a), model_io._flatten_tree(b)
    assert set(fa) == set(fb)
    for key in fa:
        np.testing.assert_array_equal(
            np.asarray(fa[key]), np.asarray(fb[key]), err_msg=key
        )


def _build_ours(name, **config):
    container = get_model_class(name)(**config)
    module = container.build_model()
    model_config = container.get_config()
    variables = _randomized_variables(module, model_config, seed=7)
    return module, model_config, variables


# ---------------------------------------------------------------------
# round trips through our own importer (no TF needed beyond the skip)
# ---------------------------------------------------------------------


def test_unet_export_roundtrip(tmp_path):
    _, model_config, variables = _build_ours(
        "unet",
        input_channels=1,
        num_classes=3,
        image_height=32,
        image_width=48,
        start_neurons=4,
        pool_layers=2,
    )
    path = model_io.save_keras_weights(
        tmp_path / "model_epoch03.hdf5", "unet", model_config, variables
    )
    assert (tmp_path / "model_config.json").exists()  # sidecar
    loaded, cfg = model_io.load_keras_model(path)
    assert loaded.name == "unet"
    assert cfg["num_classes"] == 3
    _assert_tree_equal(variables, loaded.variables)


def test_deeplab_export_roundtrip(tmp_path):
    _, model_config, variables = _build_ours(
        "deeplabv3plus",
        input_channels=3,
        num_classes=3,
        image_height=64,
        image_width=64,
    )
    path = model_io.save_keras_weights(
        tmp_path / "model_epoch01.hdf5",
        "deeplabv3plus",
        model_config,
        variables,
    )
    loaded, _ = model_io.load_keras_model(path)
    assert loaded.name == "deeplabv3plus"
    _assert_tree_equal(variables, loaded.variables)


def test_export_rejects_unknown_model(tmp_path):
    with pytest.raises(ValueError, match="save_keras_weights"):
        model_io.save_keras_weights(
            tmp_path / "m.hdf5", "resnet", {}, {"params": {}}
        )


def test_cli_export_keras(tmp_path):
    from oct_image_segmentation_models_tpu.cli import main

    _, model_config, variables = _build_ours(
        "unet",
        input_channels=1,
        num_classes=3,
        image_height=32,
        image_width=32,
        start_neurons=2,
        pool_layers=2,
    )
    native = tmp_path / "model_final.hdf5"
    model_io.save_model(native, "unet", model_config, dict(variables))

    out = tmp_path / "keras_export.hdf5"
    main(["export-keras", str(native), str(out)])
    loaded, _ = model_io.load_keras_model(out)
    _assert_tree_equal(variables, loaded.variables)


# ---------------------------------------------------------------------
# real-Keras consumption: the reference's own build_model() loads the
# exported file (order-based load_weights) and matches our forward
# ---------------------------------------------------------------------


def test_real_keras_loads_exported_unet(tmp_path):
    keras.backend.clear_session()
    cls = _import_reference_model_class("unet")

    config = dict(
        input_channels=1,
        num_classes=3,
        image_height=32,
        image_width=48,
        start_neurons=4,
        pool_layers=2,
    )
    module, model_config, variables = _build_ours("unet", **config)
    path = model_io.save_keras_weights(
        tmp_path / "export.hdf5", "unet", model_config, variables
    )

    ref_model = cls(**config).build_model()  # reference models/unet.py:106
    ref_model.load_weights(str(path))

    x = np.random.RandomState(3).normal(0, 1, (2, 32, 48, 1)).astype(
        np.float32
    )
    keras_out = np.asarray(ref_model(x, training=False))
    flax_out = np.asarray(module.apply(variables, x, training=False))
    assert keras_out.shape == flax_out.shape
    np.testing.assert_allclose(flax_out, keras_out, rtol=1e-4, atol=1e-4)


def test_real_keras_loads_exported_deeplab(tmp_path, monkeypatch):
    keras.backend.clear_session()
    cls = _import_reference_model_class("deeplabv3plus")

    # Same two semantics-preserving environment shims as
    # test_keras_parity.test_reference_own_deeplab_builder_forward_parity:
    # no egress for the hard-coded ImageNet download, and Keras 3 forbids
    # tf.nn.relu on symbolic tensors.
    real_resnet50 = keras.applications.ResNet50

    def _offline_resnet50(*args, **kwargs):
        kwargs["weights"] = None
        return real_resnet50(*args, **kwargs)

    monkeypatch.setattr(keras.applications, "ResNet50", _offline_resnet50)

    real_relu = tf.nn.relu

    def _symbolic_safe_relu(x, name=None):
        if isinstance(x, keras.KerasTensor):
            return keras.layers.Activation("relu")(x)
        return real_relu(x, name=name)

    monkeypatch.setattr(tf.nn, "relu", _symbolic_safe_relu)

    config = dict(
        input_channels=3, num_classes=3, image_height=64, image_width=96
    )
    module, model_config, variables = _build_ours("deeplabv3plus", **config)
    path = model_io.save_keras_weights(
        tmp_path / "export.hdf5", "deeplabv3plus", model_config, variables
    )

    ref_model = cls(**config).build_model()  # reference deeplabv3plus.py:86
    ref_model.load_weights(str(path))

    x = np.random.RandomState(5).normal(0, 1, (2, 64, 96, 3)).astype(
        np.float32
    )
    keras_out = np.asarray(ref_model(x, training=False))
    flax_out = np.asarray(module.apply(variables, x, training=False))
    assert keras_out.shape == flax_out.shape
    np.testing.assert_allclose(flax_out, keras_out, rtol=1e-3, atol=1e-4)
