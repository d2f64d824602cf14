"""Model construction, shapes, and registry parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oct_image_segmentation_models_tpu.models import (
    get_model_class,
    model_name_map,
)


def test_registry_names():
    assert set(model_name_map) == {"unet", "deeplabv3plus"}
    with pytest.raises(ValueError):
        get_model_class("nope")


def test_spatial_divisor():
    """Geometry guards key off container.spatial_divisor — a per-model
    contract, not a guessed pool_layers attribute (DeepLabV3+ has none,
    but its decoder concat still requires H/W % 4 == 0)."""
    unet = get_model_class("unet")(
        input_channels=1, num_classes=3, image_height=32, image_width=32,
        pool_layers=3,
    )
    assert unet.spatial_divisor == 8
    deeplab = get_model_class("deeplabv3plus")(
        input_channels=3, num_classes=3, image_height=32, image_width=32
    )
    assert deeplab.spatial_divisor == 4


def test_unet_forward_shapes_and_softmax():
    container = get_model_class("unet")(
        input_channels=1,
        num_classes=4,
        image_height=32,
        image_width=64,
        start_neurons=4,
        pool_layers=3,
    )
    module = container.build_model()
    x = jnp.zeros((2, 32, 64, 1), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x, training=False)
    out = jax.jit(lambda v, x: module.apply(v, x, training=False))(variables, x)
    assert out.shape == (2, 32, 64, 4)
    assert np.allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)
    # BatchNorm stats collection exists
    assert "batch_stats" in variables
    # config round-trip matches the reference's keys
    cfg = container.get_config()
    for key in (
        "input_channels",
        "num_classes",
        "image_height",
        "image_width",
        "start_neurons",
        "pool_layers",
        "conv_layers",
        "enc_kernel",
        "dec_kernel",
    ):
        assert key in cfg
    # preprocess is x/255 (XLA may lower as multiply-by-reciprocal)
    assert abs(float(container.get_preprocess_input_fn()(jnp.array(255.0))) - 1.0) < 1e-6


def test_config_round_trips_compute_dtype():
    """get_config() carries the compute dtype, so rebuilding a container
    from a checkpoint's saved config preserves a bfloat16-trained model
    instead of silently reverting to float32 (extension knob beyond the
    reference's config keys, `models/unet.py:93-104`)."""
    for name, extra in (
        ("unet", {"input_channels": 1, "start_neurons": 2, "pool_layers": 2}),
        ("deeplabv3plus", {"input_channels": 3}),
    ):
        container = get_model_class(name)(
            num_classes=3,
            image_height=32,
            image_width=32,
            dtype="bfloat16",
            **extra,
        )
        cfg = container.get_config()
        assert jnp.dtype(cfg["dtype"]) == jnp.bfloat16
        rebuilt = get_model_class(name)(**cfg)
        assert jnp.dtype(rebuilt.dtype) == jnp.bfloat16
        assert rebuilt.get_config() == cfg


def test_unet_train_mode_runs_with_dropout_rng():
    container = get_model_class("unet")(
        input_channels=1,
        num_classes=2,
        image_height=16,
        image_width=16,
        start_neurons=2,
        pool_layers=2,
    )
    module = container.build_model()
    x = jnp.zeros((1, 16, 16, 1))
    variables = module.init(jax.random.PRNGKey(0), x, training=False)
    out, mutated = module.apply(
        variables,
        x,
        training=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert out.shape == (1, 16, 16, 2)
    assert "batch_stats" in mutated


def test_deeplab_forward_shape():
    container = get_model_class("deeplabv3plus")(
        input_channels=3,
        num_classes=3,
        image_height=64,
        image_width=64,
    )
    module = container.build_model()
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init(jax.random.PRNGKey(0), x, training=False)
    out = module.apply(variables, x, training=False)
    assert out.shape == (1, 64, 64, 3)
    # caffe-style preprocessing: BGR flip + mean subtraction
    pre = container.get_preprocess_input_fn()
    v = np.asarray(pre(jnp.zeros((1, 2, 2, 3))))
    assert np.allclose(v[0, 0, 0], [-103.939, -116.779, -123.68])


def test_resnet50_keras_layer_names_present():
    from oct_image_segmentation_models_tpu.models.resnet import ResNet50Backbone

    m = ResNet50Backbone()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = variables["params"]
    for name in ("conv1_conv", "conv2_block1_1_conv", "conv4_block6_2_conv"):
        assert name in params, sorted(params)[:5]
    # The reference prunes its functional model at conv4_block6_2_relu,
    # so real reference checkpoints carry neither conv5 (~15M params)
    # nor the block6 3_conv/3_bn tail — none of those may exist here or
    # real checkpoints couldn't populate them (tests/test_keras_parity.py
    # proves the exact layer set against actual Keras).
    assert not any(k.startswith("conv5") for k in params)
    assert "conv4_block6_3_conv" not in params
    assert "conv4_block6_3_bn" not in params


def test_batchnorm_folding_matches():
    from oct_image_segmentation_models_tpu.models.unet import (
        UNetModule,
        fold_batchnorm_variables,
    )
    import flax

    module = UNetModule(num_classes=3, start_neurons=2, pool_layers=2)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), x, training=False)
    # non-trivial running stats
    variables = flax.core.unfreeze(variables)
    for blk in variables["batch_stats"].values():
        blk["BatchNorm_0"]["mean"] = blk["BatchNorm_0"]["mean"] + 0.1
        blk["BatchNorm_0"]["var"] = blk["BatchNorm_0"]["var"] * 1.5
    want = module.apply(variables, x, training=False)
    folded_module = UNetModule(num_classes=3, start_neurons=2, pool_layers=2,
                               use_bn=False)
    folded = fold_batchnorm_variables(variables)
    got = folded_module.apply(folded, x, training=False)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def _perturb_batch_stats(tree, rng):
    """Give every BN leaf non-trivial running stats (in place)."""
    for key, node in tree.items():
        if isinstance(node, dict):
            if "mean" in node and "var" in node:
                node["mean"] = node["mean"] + rng.normal(
                    0.0, 0.2, node["mean"].shape
                ).astype(np.float32)
                node["var"] = node["var"] * rng.uniform(
                    0.5, 2.0, node["var"].shape
                ).astype(np.float32)
            else:
                _perturb_batch_stats(node, rng)


def test_deeplab_batchnorm_folding_matches():
    """BN folding covers both naming schemes in the DeepLab tree (Keras
    ``*_conv``/``*_bn`` backbone pairs and Flax ``_ConvBlock`` children)
    and reproduces the eval-mode forward."""
    import flax

    from oct_image_segmentation_models_tpu.models.deeplabv3plus import (
        DeeplabV3PlusModule,
        fold_deeplab_batchnorm_variables,
        maybe_build_folded_apply,
    )

    module = DeeplabV3PlusModule(num_classes=2)
    rng = np.random.default_rng(0)
    x = rng.normal(0.0, 50.0, size=(1, 32, 32, 3)).astype(np.float32)
    variables = flax.core.unfreeze(
        module.init(jax.random.PRNGKey(0), x, training=False)
    )
    _perturb_batch_stats(variables["batch_stats"], rng)
    want = np.asarray(module.apply(variables, x, training=False))

    folded_module = DeeplabV3PlusModule(num_classes=2, use_bn=False)
    folded = fold_deeplab_batchnorm_variables(variables)
    got = np.asarray(folded_module.apply(folded, x, training=False))
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()

    # the single decision point the inference surfaces use; weights come
    # back separately so callers pass them as jit arguments (not
    # captured constants — the folded backbone is ~108 MB f32)
    apply_fn, fold_vars = maybe_build_folded_apply(module, variables)
    assert apply_fn is not None
    assert np.allclose(np.asarray(apply_fn(fold_vars, x)), want, atol=1e-4)

    # bfloat16 backbone: same shape, probabilities close at tiny scale
    apply_bf16, fold16_vars = maybe_build_folded_apply(
        module, variables, dtype=jnp.bfloat16
    )
    out16 = np.asarray(apply_bf16(fold16_vars, x))
    assert out16.shape == want.shape
    assert out16.dtype == np.float32  # head + softmax stay f32
    assert np.abs(out16 - want).max() < 0.15

    # ineligible without batch_stats (untrained checkpoint)
    assert maybe_build_folded_apply(
        module, {"params": variables["params"]}
    ) == (None, None)
