"""Space-to-depth transformed U-Net inference path (ops/s2d_unet.py)
vs the parity ``UNetModule`` — must agree to float tolerance for every
transformed-level count, config, and odd spatial geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oct_image_segmentation_models_tpu.models import get_model_class
from oct_image_segmentation_models_tpu.ops.s2d_unet import (
    build_s2d_apply,
    s2d_eligible_levels,
)


def _model(cin=1, num_classes=3, h=16, w=24, **hp):
    container = get_model_class("unet")(
        input_channels=cin,
        num_classes=num_classes,
        image_height=h,
        image_width=w,
        **hp,
    )
    module = container.build_model()
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, h, w, cin), jnp.float32)
    variables = module.init(rng, x, training=False)
    # non-trivial batch stats so BN folding is exercised
    bs = jax.tree_util.tree_map(
        lambda a: a + jax.random.uniform(rng, a.shape) * 0.1 + 0.05,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    ref = module.apply(variables, x, training=False)
    return container, variables, x, ref


@pytest.mark.parametrize(
    "cfg",
    [
        dict(start_neurons=4, pool_layers=2, conv_layers=2, h=16, w=24),
        dict(start_neurons=8, pool_layers=3, conv_layers=2, h=32, w=32),
        dict(start_neurons=4, pool_layers=2, conv_layers=2, h=16, w=16, cin=3),
    ],
)
def test_s2d_matches_parity_module(cfg):
    cin = cfg.pop("cin", 1)
    h, w = cfg.pop("h"), cfg.pop("w")
    container, variables, x, ref = _model(cin=cin, h=h, w=w, **cfg)
    for levels in range(cfg["pool_layers"] + 1):
        fn = build_s2d_apply(
            variables, container.get_config(), s2d_levels=levels
        )
        out = jax.jit(fn)(x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=0
        )


def test_s2d_auto_levels():
    # 32 base filters (flagship): top two levels stay under the 128-lane
    # width -> transformed; odd conv counts and big kernels disable it.
    assert s2d_eligible_levels(32, 4, 2, (3, 3), (2, 2)) == 2
    assert s2d_eligible_levels(8, 4, 2, (3, 3), (2, 2)) == 4
    assert s2d_eligible_levels(32, 4, 3, (3, 3), (2, 2)) == 0
    assert s2d_eligible_levels(32, 4, 2, (5, 5), (2, 2)) == 0
    # conv_layers=0 has no post-concat conv to bake the decoder's
    # split-concat permutation into — must take the parity path, not
    # silently scramble channels (r5 review finding).
    assert s2d_eligible_levels(32, 4, 0, (3, 3), (2, 2)) == 0


def test_s2d_rejects_odd_spatial():
    container, variables, _, _ = _model(
        h=16, w=24, start_neurons=4, pool_layers=2, conv_layers=2
    )
    fn = build_s2d_apply(variables, container.get_config(), s2d_levels=1)
    with pytest.raises(AssertionError, match="even spatial"):
        fn(jnp.zeros((1, 15, 24, 1), jnp.float32))


def test_s2d_uint8_preprocess_pipeline_consistency():
    """The optimized path must agree with the parity module on the real
    uint8 -> /255 -> forward inference flow (argmax identical)."""
    container, variables, _, _ = _model(h=32, w=32, start_neurons=4,
                                        pool_layers=2, conv_layers=2)
    module = container.build_model()
    pre = container.get_preprocess_input_fn()
    imgs = np.random.default_rng(0).integers(
        0, 255, (3, 32, 32, 1), np.uint8
    )
    x = pre(jnp.asarray(imgs, jnp.float32))
    ref = module.apply(variables, x, training=False)
    fn = build_s2d_apply(variables, container.get_config())
    out = jax.jit(fn)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    assert np.array_equal(
        np.argmax(np.asarray(out), -1), np.argmax(np.asarray(ref), -1)
    )


def test_s2d_labels_outputs_match_probs_argmax():
    container, variables, x, ref = _model(
        start_neurons=4, pool_layers=2, conv_layers=2
    )
    cfg = container.get_config()
    probs = jax.jit(build_s2d_apply(variables, cfg))(x)
    want = np.argmax(np.asarray(probs), axis=-1).astype(np.uint8)
    got = np.asarray(
        jax.jit(build_s2d_apply(variables, cfg, output="labels"))(x)
    )
    assert np.array_equal(want, got)
    lab_s2d = np.asarray(
        jax.jit(build_s2d_apply(variables, cfg, output="labels_s2d"))(x)
    )
    b, hb, wb, four = lab_s2d.shape
    assert four == 4
    d2s = (
        lab_s2d.reshape(b, hb, wb, 2, 2)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, 2 * hb, 2 * wb)
    )
    assert np.array_equal(want, d2s)


def test_s2d_labels_requires_transformed_levels():
    container, variables, x, ref = _model(
        start_neurons=4, pool_layers=2, conv_layers=2
    )
    with pytest.raises(ValueError):
        build_s2d_apply(
            variables, container.get_config(), s2d_levels=0,
            output="labels_s2d",
        )


def test_fused_pipeline_labels_path_matches_probs_path():
    from oct_image_segmentation_models_tpu.ops.inference import (
        make_fused_pipeline,
    )

    container, variables, x, ref = _model(
        num_classes=4, start_neurons=4, pool_layers=2, conv_layers=2
    )
    cfg = container.get_config()
    module = container.build_model()
    pre = container.get_preprocess_input_fn()
    images = (np.asarray(x) * 255).astype(np.uint8)
    ref_pipe = make_fused_pipeline(module, pre)
    labels_fn = build_s2d_apply(variables, cfg, output="labels_s2d")
    fast_pipe = make_fused_pipeline(
        module, pre, labels_apply_fn=labels_fn, num_classes=4
    )
    want_labels, want_maps, want_delins = ref_pipe(variables, images)
    got_labels, got_maps, got_delins = fast_pipe(variables, images)
    assert np.array_equal(np.asarray(want_labels), np.asarray(got_labels))
    assert np.array_equal(np.asarray(want_maps), np.asarray(got_maps))
    assert np.array_equal(np.asarray(want_delins), np.asarray(got_delins))


def test_bf16_stack_accuracy_tolerance(tmp_path):
    """bfloat16 conv stack vs float32 on a trained model: labels must
    agree on nearly every pixel and min-path boundary rows must stay
    within the 0.05 px MAE budget (BASELINE.md north star)."""
    from oct_image_segmentation_models_tpu.common.model_io import (
        load_model_and_config,
    )
    from oct_image_segmentation_models_tpu.ops import boundary as bops
    from oct_image_segmentation_models_tpu.ops import minpath as mops
    from oct_image_segmentation_models_tpu.ops.s2d_unet import d2s
    from oct_image_segmentation_models_tpu.training import (
        TrainingParams,
        train_model,
    )

    from synth import make_dataset, make_layered_sample

    ds = make_dataset(tmp_path / "ds.hdf5", n_train=8, n_val=4, n_test=2,
                      h=32, w=64, num_classes=3, seed=3)
    folder = train_model(
        TrainingParams(
            model_architecture="unet",
            training_dataset_path=ds,
            initial_model=None,
            results_location=tmp_path,
            opt_con="adam",
            opt_params={"learning_rate": 5e-3},
            loss="dice_loss_macro",
            metric="dice_coef_macro",
            epochs=6,
            batch_size=4,
            model_hyperparameters={"start_neurons": 4, "pool_layers": 2},
            seed=0,
            aug_mode="none",
        ),
        None,
    )
    ckpt = sorted(folder.glob("model_epoch*.hdf5"))[-1]
    loaded, config = load_model_and_config(ckpt)

    rng = np.random.default_rng(7)
    images = np.stack(
        [make_layered_sample(rng, 32, 64, 3)[0] for _ in range(6)]
    )[..., None]
    x = images.astype(np.float32) / 255.0

    outs = {}
    for dt in (jnp.float32, jnp.bfloat16):
        fn = build_s2d_apply(
            dict(loaded.variables), config, output="labels_s2d", dtype=dt
        )
        lab_s2d = jax.jit(fn)(x)
        labels = d2s(lab_s2d)[..., 0]
        maps_t = bops.boundary_maps_from_s2d_labels(
            lab_s2d, config["num_classes"], transposed=True
        )
        delins = mops.delineate(maps_t, backend="xla")
        outs[dt.__name__] = (np.asarray(labels), np.asarray(delins))

    lab32, del32 = outs["float32"]
    lab16, del16 = outs["bfloat16"]
    agree = (lab32 == lab16).mean()
    mae = np.abs(del32.astype(float) - del16.astype(float)).mean()
    assert agree > 0.995, agree
    assert mae < 0.05, mae
