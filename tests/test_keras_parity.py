"""Numerical parity against REAL Keras models.

The synthetic-layout tests in ``test_keras_import.py`` check the h5
plumbing; these tests are the stronger claim: a model built by actual
``tensorflow.keras`` — the reference's runtime (reference
`pyproject.toml:31`) — produces the SAME forward outputs as the Flax
model after importing its weights through
:mod:`oct_image_segmentation_models_tpu.common.model_io`. That proves
layer naming/order, conv 'same' padding (including the asymmetric even
2x2 decoder kernel), BatchNorm eval semantics (momentum/eps), stem
zero-padding, and stride placement all match — i.e. a real reference
checkpoint (ImageNet backbone included) loads correctly, not just one we
synthesized in the expected layout.

Keras layer creation order mirrors reference `models/unet.py:106-147`
(builder re-written here from the documented block structure, not
copied). ImageNet *weights* are not available offline; since the import
is weight-agnostic, parity on randomly-initialized weights carries the
same evidence.
"""

import json

import h5py
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
from tensorflow import keras  # noqa: E402

from oct_image_segmentation_models_tpu.common import model_io  # noqa: E402


def _randomize_bn_and_bias(model, seed):
    """Glorot conv kernels are already random; make BN affines/stats and
    conv biases non-trivial (Keras inits them to identity/zero, which
    would let a broken import pass unnoticed) while keeping activation
    magnitudes stable through deep stacks."""
    rng = np.random.RandomState(seed)
    for layer in model.layers:
        ws = layer.get_weights()
        if not ws:
            continue
        if isinstance(layer, keras.layers.Conv2D):
            if len(ws) == 2:  # use_bias=False convs carry kernel only
                ws = [
                    ws[0],
                    rng.normal(0.0, 0.01, ws[1].shape).astype(np.float32),
                ]
        elif isinstance(layer, keras.layers.BatchNormalization):
            gamma, beta, mean, var = ws
            ws = [
                rng.uniform(0.8, 1.2, gamma.shape).astype(np.float32),
                rng.normal(0.0, 0.05, beta.shape).astype(np.float32),
                rng.normal(0.0, 0.05, mean.shape).astype(np.float32),
                rng.uniform(0.8, 1.2, var.shape).astype(np.float32),
            ]
        layer.set_weights(ws)


_WEIGHT_NAMES = {
    keras.layers.Conv2D: ("kernel", "bias"),
    keras.layers.BatchNormalization: (
        "gamma",
        "beta",
        "moving_mean",
        "moving_variance",
    ),
}


def _write_keras_h5(path, model, model_name=None):
    """Write the model's weights in the reference-era Keras HDF5 layout
    (``model_weights/<layer>/<layer>/<weight>:0``, reference checkpoints
    from `training/training.py:319-326`)."""
    with h5py.File(path, "w") as f:
        if model_name is not None:
            f.attrs["model_config"] = json.dumps(
                {"class_name": "Functional", "config": {"name": model_name}}
            )
        root = f.create_group("model_weights")
        for layer in model.layers:
            ws = layer.get_weights()
            if not ws:
                continue
            for cls, names in _WEIGHT_NAMES.items():
                if isinstance(layer, cls):
                    g = root.create_group(layer.name).create_group(layer.name)
                    for name, w in zip(names, ws):
                        g[name + ":0"] = w
                    break
            else:
                raise AssertionError(
                    f"unexpected weighted layer {type(layer).__name__}"
                )


def _build_reference_unet_keras(
    input_channels, num_classes, start_neurons, pool_layers, conv_layers=2
):
    """The reference U-Net block structure (`models/unet.py:106-147`):
    enc levels of ``conv_layers`` x (Conv3x3 same -> BN -> ReLU) + 2x2
    max-pool, bottleneck convs + Dropout(0.5), decoder levels of
    nearest-UpSampling2D -> (Conv2x2 same -> BN -> ReLU) -> concat skip
    -> conv blocks, and a 1x1 softmax head."""
    L = keras.layers

    def conv_block(x, filters, kernel):
        x = L.Conv2D(filters, kernel, strides=(1, 1), padding="same")(x)
        x = L.BatchNormalization()(x)
        return L.Activation("relu")(x)

    inp = L.Input((None, None, input_channels))
    x = inp
    skips = []
    for i in range(pool_layers):
        for _ in range(conv_layers):
            x = conv_block(x, start_neurons * 2**i, (3, 3))
        skips.append(x)
        x = L.MaxPooling2D((2, 2))(x)
    for _ in range(conv_layers):
        x = conv_block(x, start_neurons * 2**pool_layers, (3, 3))
    x = L.Dropout(0.5)(x)
    for i in reversed(range(pool_layers)):
        x = L.UpSampling2D()(x)
        x = conv_block(x, start_neurons * 2**i, (2, 2))
        x = L.Concatenate()([x, skips[i]])
        for _ in range(conv_layers):
            x = conv_block(x, start_neurons * 2**i, (3, 3))
    out = L.Conv2D(num_classes, (1, 1), activation="softmax")(x)
    return keras.Model(inp, out, name="unet")


def test_real_keras_unet_forward_parity(tmp_path):
    keras.backend.clear_session()  # conv2d/batch_normalization counters
    model = _build_reference_unet_keras(
        input_channels=1, num_classes=3, start_neurons=4, pool_layers=2
    )
    _randomize_bn_and_bias(model, seed=0)

    h5_path = tmp_path / "model_epoch07.hdf5"
    _write_keras_h5(h5_path, model, model_name="unet")
    config = {
        "input_channels": 1,
        "num_classes": 3,
        "image_height": 32,
        "image_width": 48,
        "start_neurons": 4,
        "pool_layers": 2,
    }

    loaded, _ = model_io.load_keras_model(h5_path, model_config=config)

    x = np.random.RandomState(1).uniform(0, 1, (2, 32, 48, 1)).astype(
        np.float32
    )
    keras_out = np.asarray(model(x, training=False))
    flax_out = np.asarray(
        loaded.module.apply(loaded.variables, x, training=False)
    )

    assert keras_out.shape == flax_out.shape == (2, 32, 48, 3)
    np.testing.assert_allclose(flax_out, keras_out, rtol=1e-4, atol=1e-5)


def _build_reference_deeplab_keras(image_height, image_width, num_classes):
    """The reference DeepLabV3+ (`models/deeplabv3plus.py:86-131`):
    ResNet50 backbone (weights omitted — offline; values are irrelevant
    for import parity), DSPP over the conv4 tap (global avg-pool branch
    with bias + bilinear upsample; 1x1 and dilated-3x3 rate 6/12/18
    branches without bias; 1x1 projection), bilinear decoder joining the
    conv2 tap through a 48-filter 1x1, two 3x3 blocks, full-resolution
    bilinear upsample, 1x1 softmax head. All DSPP/decoder convs are
    use_bias=False + BN + ReLU except the pool branch and the head."""
    L = keras.layers

    def conv_block(x, filters=256, kernel=3, dilation=1, use_bias=False):
        x = L.Conv2D(
            filters, kernel, dilation_rate=dilation, padding="same",
            use_bias=use_bias,
        )(x)
        x = L.BatchNormalization()(x)
        return L.Activation("relu")(x)

    inp = keras.Input(shape=(image_height, image_width, 3))
    resnet50 = keras.applications.ResNet50(
        weights=None, include_top=False, input_tensor=inp
    )
    x = resnet50.get_layer("conv4_block6_2_relu").output

    dims = x.shape
    pool = L.AveragePooling2D(pool_size=(dims[-3], dims[-2]))(x)
    pool = conv_block(pool, kernel=1, use_bias=True)
    out_pool = L.UpSampling2D(
        size=(dims[-3] // pool.shape[1], dims[-2] // pool.shape[2]),
        interpolation="bilinear",
    )(pool)
    out_1 = conv_block(x, kernel=1)
    out_6 = conv_block(x, kernel=3, dilation=6)
    out_12 = conv_block(x, kernel=3, dilation=12)
    out_18 = conv_block(x, kernel=3, dilation=18)
    x = L.Concatenate(axis=-1)([out_pool, out_1, out_6, out_12, out_18])
    x = conv_block(x, kernel=1)

    input_a = L.UpSampling2D(
        size=(
            image_height // 4 // x.shape[1],
            image_width // 4 // x.shape[2],
        ),
        interpolation="bilinear",
    )(x)
    input_b = conv_block(
        resnet50.get_layer("conv2_block3_2_relu").output, filters=48, kernel=1
    )
    x = L.Concatenate(axis=-1)([input_a, input_b])
    x = conv_block(x)
    x = conv_block(x)
    x = L.UpSampling2D(
        size=(image_height // x.shape[1], image_width // x.shape[2]),
        interpolation="bilinear",
    )(x)
    out = L.Conv2D(
        num_classes, (1, 1), padding="same", activation="softmax"
    )(x)
    return keras.Model(inp, out, name="deeplabv3plus")


def test_real_keras_deeplab_forward_parity(tmp_path):
    keras.backend.clear_session()
    model = _build_reference_deeplab_keras(64, 96, num_classes=3)
    _randomize_bn_and_bias(model, seed=4)

    h5_path = tmp_path / "model_epoch02.hdf5"
    _write_keras_h5(h5_path, model, model_name="deeplabv3plus")
    config = {
        "input_channels": 3,
        "num_classes": 3,
        "image_height": 64,
        "image_width": 96,
    }

    loaded, _ = model_io.load_keras_model(h5_path, model_config=config)

    x = np.random.RandomState(5).normal(0, 1, (2, 64, 96, 3)).astype(
        np.float32
    )
    keras_out = np.asarray(model(x, training=False))
    flax_out = np.asarray(
        loaded.module.apply(loaded.variables, x, training=False)
    )

    assert keras_out.shape == flax_out.shape == (2, 64, 96, 3)
    np.testing.assert_allclose(flax_out, keras_out, rtol=1e-3, atol=1e-4)


def test_deeplab_preprocess_matches_keras_resnet50():
    """The DeepLab container's preprocess must equal the real
    ``keras.applications.resnet50.preprocess_input`` (caffe mode:
    RGB->BGR + ImageNet mean subtraction, reference
    `models/deeplabv3plus.py:83-84`)."""
    from oct_image_segmentation_models_tpu.models import get_model_class

    container = get_model_class("deeplabv3plus")(
        input_channels=3, num_classes=3, image_height=32, image_width=32
    )
    x = np.random.RandomState(6).uniform(0, 255, (2, 32, 32, 3)).astype(
        np.float32
    )
    ours = np.asarray(container.get_preprocess_input_fn()(x))
    theirs = keras.applications.resnet50.preprocess_input(x.copy())
    np.testing.assert_allclose(ours, np.asarray(theirs), atol=1e-5)


def test_real_keras_resnet50_backbone_parity(tmp_path):
    """Our Flax ResNet50 backbone vs ``keras.applications.ResNet50``:
    the exact model the reference's DeepLabV3+ taps at
    ``conv2_block3_2_relu`` / ``conv4_block6_2_relu`` (reference
    `models/deeplabv3plus.py:91-106`), weights imported by layer name
    via ``load_keras_resnet50_weights``."""
    import jax

    from oct_image_segmentation_models_tpu.models.resnet import (
        ResNet50Backbone,
    )

    keras.backend.clear_session()
    m = keras.applications.ResNet50(
        weights=None, include_top=False, input_shape=(64, 64, 3)
    )
    _randomize_bn_and_bias(m, seed=2)
    taps = keras.Model(
        m.input,
        [
            m.get_layer("conv2_block3_2_relu").output,
            m.get_layer("conv4_block6_2_relu").output,
        ],
    )

    h5_path = tmp_path / "resnet50.h5"
    _write_keras_h5(h5_path, m)

    module = ResNet50Backbone()
    variables = module.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32),
        training=False,
    )
    params, batch_stats = model_io.load_keras_resnet50_weights(
        variables["params"], h5_path
    )

    x = np.random.RandomState(3).normal(0, 1, (2, 64, 64, 3)).astype(
        np.float32
    )
    k_low, k_high = (np.asarray(t) for t in taps(x, training=False))
    _, taps_out = module.apply(
        {"params": params, "batch_stats": batch_stats}, x, training=False
    )

    low = np.asarray(taps_out["conv2_block3_2_relu"])
    high = np.asarray(taps_out["conv4_block6_2_relu"])
    assert low.shape == k_low.shape and high.shape == k_high.shape
    np.testing.assert_allclose(low, k_low, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(high, k_high, rtol=1e-3, atol=1e-3)


# --------------------------------------------------------------------
# The tests above rebuild the reference architectures from their
# documented block structure; these two go further and run the
# REFERENCE'S OWN ``build_model()`` (imported from /root/reference at
# runtime) to produce the Keras model we import from — removing the
# re-written-builder trust step entirely. Skipped off this rig.


def _import_reference_model_class(name):
    import sys

    ref_root = "/root/reference"
    import os

    if not os.path.isdir(ref_root):
        pytest.skip("upstream reference tree not available")
    sys.path.insert(0, ref_root)
    try:
        try:
            from oct_image_segmentation_models.models import get_model_class

            return get_model_class(name)
        except Exception as exc:  # keras version drift
            pytest.skip(f"reference models unimportable: {exc}")
    finally:
        sys.path.remove(ref_root)


def test_reference_own_unet_builder_forward_parity(tmp_path):
    keras.backend.clear_session()
    cls = _import_reference_model_class("unet")
    container = cls(
        input_channels=1,
        num_classes=3,
        image_height=32,
        image_width=48,
        start_neurons=4,
        pool_layers=2,
    )
    model = container.build_model()  # reference models/unet.py:106-153
    _randomize_bn_and_bias(model, seed=11)

    h5_path = tmp_path / "model_epoch03.hdf5"
    _write_keras_h5(h5_path, model, model_name="unet")
    loaded, _ = model_io.load_keras_model(
        h5_path, model_config=container.get_config()
    )

    x = np.random.RandomState(13).uniform(0, 1, (2, 32, 48, 1)).astype(
        np.float32
    )
    keras_out = np.asarray(model(x, training=False))
    flax_out = np.asarray(
        loaded.module.apply(loaded.variables, x, training=False)
    )
    assert keras_out.shape == flax_out.shape == (2, 32, 48, 3)
    np.testing.assert_allclose(flax_out, keras_out, rtol=1e-4, atol=1e-5)


def test_reference_own_deeplab_builder_forward_parity(tmp_path, monkeypatch):
    keras.backend.clear_session()
    cls = _import_reference_model_class("deeplabv3plus")

    # Two environment shims, semantics-preserving: (a) no egress, so
    # force the reference's hard-coded ``weights="imagenet"``
    # (`deeplabv3plus.py:91-93`) to random init — weight VALUES are
    # irrelevant for import parity; (b) Keras 3 forbids tf.nn.relu on
    # KerasTensors, so route the reference's ``tf.nn.relu`` call
    # (`deeplabv3plus.py:30`) through the equivalent Activation layer.
    real_resnet50 = keras.applications.ResNet50

    def _offline_resnet50(*args, **kwargs):
        kwargs["weights"] = None
        return real_resnet50(*args, **kwargs)

    monkeypatch.setattr(keras.applications, "ResNet50", _offline_resnet50)

    real_relu = tf.nn.relu

    def _symbolic_safe_relu(x, name=None):
        # Only symbolic build-time calls need the layer detour; concrete
        # tensors at predict time must use the real op (Keras's own relu
        # dispatches through tf.nn.relu, so an unconditional patch
        # recurses).
        if isinstance(x, keras.KerasTensor):
            return keras.layers.Activation("relu")(x)
        return real_relu(x, name=name)

    monkeypatch.setattr(tf.nn, "relu", _symbolic_safe_relu)

    container = cls(
        input_channels=3, num_classes=3, image_height=64, image_width=96
    )
    model = container.build_model()  # reference deeplabv3plus.py:86-131
    _randomize_bn_and_bias(model, seed=17)

    h5_path = tmp_path / "model_epoch05.hdf5"
    _write_keras_h5(h5_path, model, model_name="deeplabv3plus")
    loaded, _ = model_io.load_keras_model(
        h5_path, model_config=container.get_config()
    )

    x = np.random.RandomState(19).normal(0, 1, (2, 64, 96, 3)).astype(
        np.float32
    )
    keras_out = np.asarray(model(x, training=False))
    flax_out = np.asarray(
        loaded.module.apply(loaded.variables, x, training=False)
    )
    assert keras_out.shape == flax_out.shape == (2, 64, 96, 3)
    np.testing.assert_allclose(flax_out, keras_out, rtol=1e-3, atol=1e-4)
