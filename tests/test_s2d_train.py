"""S2DTrainForward (ops/s2d_train.py) vs the parity UNetModule: eval
forward bit-exact; train-mode loss, parameter gradients, and BatchNorm
batch-stats updates equal to float32 tolerance (same dropout rng)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oct_image_segmentation_models_tpu.models import get_model_class
from oct_image_segmentation_models_tpu.ops.s2d_train import S2DTrainForward


def _setup(cfg):
    container = get_model_class("unet")(
        input_channels=1,
        num_classes=cfg["num_classes"],
        image_height=cfg["h"],
        image_width=cfg["w"],
        start_neurons=cfg["start_neurons"],
        pool_layers=cfg["pool_layers"],
        conv_layers=cfg["conv_layers"],
    )
    module = container.build_model()
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, cfg["h"], cfg["w"], 1), jnp.float32)
    variables = module.init(rng, x, training=False)
    bs = jax.tree_util.tree_map(
        lambda a: a + jax.random.uniform(rng, a.shape) * 0.1 + 0.05,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    return container, module, variables, x


@pytest.mark.parametrize(
    "cfg",
    [
        # shallow: gradient parity is tight
        dict(start_neurons=4, pool_layers=2, conv_layers=2, num_classes=3,
             h=16, w=24, gtol=2e-6),
        # deeper: backward through stacked BatchNorms amplifies f32
        # rounding (verified to scale away under x64: 7.6e-4 @ f32 ->
        # 4.5e-8 @ f64, i.e. reassociation noise, not a math difference)
        dict(start_neurons=8, pool_layers=3, conv_layers=2, num_classes=4,
             h=32, w=32, gtol=3e-3),
    ],
)
def test_s2d_train_forward_matches_parity(cfg):
    gtol = cfg.pop("gtol")
    container, module, variables, x = _setup(cfg)
    fwd = S2DTrainForward(container.get_config())
    assert fwd.s2d_levels > 0

    ref = module.apply(variables, x, training=False)
    got = fwd.apply(variables, x, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    labels = jax.random.randint(
        jax.random.PRNGKey(3), (2, cfg["h"], cfg["w"]), 0, cfg["num_classes"]
    )
    onehot = jax.nn.one_hot(labels, cfg["num_classes"])
    drng = jax.random.PRNGKey(42)

    def make_loss(apply):
        def loss(p):
            out, mut = apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x,
                training=True,
                rngs={"dropout": drng},
                mutable=["batch_stats"],
            )
            return (
                -(onehot * jnp.log(out + 1e-7)).mean(),
                mut["batch_stats"],
            )

        return loss

    (l_ref, st_ref), g_ref = jax.value_and_grad(
        make_loss(module.apply), has_aux=True
    )(variables["params"])
    (l_got, st_got), g_got = jax.value_and_grad(
        make_loss(fwd.apply), has_aux=True
    )(variables["params"])

    # identical dropout masks (flax rng fold reproduced) => tight bounds
    assert abs(float(l_ref - l_got)) < 1e-6
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_got)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=gtol)
    for a, b in zip(
        jax.tree_util.tree_leaves(st_ref), jax.tree_util.tree_leaves(st_got)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_s2d_train_in_train_step():
    """S2DTrainForward drops into make_train_step (shard_map impl, 8
    virtual devices) and optimizes."""
    from oct_image_segmentation_models_tpu.ops import losses, metrics
    from oct_image_segmentation_models_tpu.parallel.mesh import (
        create_mesh,
        shard_batch,
    )
    from oct_image_segmentation_models_tpu.parallel.train_step import (
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    cfg = dict(start_neurons=4, pool_layers=2, conv_layers=2, num_classes=3,
               h=16, w=16)
    container, module, variables, _ = _setup(cfg)
    fwd = S2DTrainForward(container.get_config())
    mesh = create_mesh(jax.devices()[:8])
    tx = build_optimizer("adam", {"learning_rate": 1e-2})
    loss_fn = losses.custom_loss_objects["dice_loss_macro"]["function"](
        num_classes=3, is_y_true_sparse=True
    )
    metric_fn = metrics.dice_coef_macro(True, 3)
    state = create_train_state(dict(variables), tx, mesh)
    step = make_train_step(fwd, tx, loss_fn, metric_fn, mesh,
                           impl="shard_map")
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (8, 16, 16, 1)).astype(np.float32)
    labels = rng.integers(0, 3, (8, 16, 16, 1)).astype(np.int32)
    imgs, labels = shard_batch((imgs, labels), mesh)
    losses_seen = []
    for i in range(4):
        state, loss, _ = step(state, imgs, labels, jax.random.PRNGKey(i))
        losses_seen.append(float(loss))
    assert losses_seen[-1] < losses_seen[0]


def test_train_forward_impl_validation(tmp_path):
    """train_forward_impl='s2d' must fail fast for ineligible configs."""
    import pytest

    from oct_image_segmentation_models_tpu.training import (
        TrainingParams,
        train_model,
    )

    from synth import make_dataset

    ds = make_dataset(tmp_path / "ds.hdf5", n_train=4, n_val=2, n_test=2,
                      h=16, w=16)
    params = TrainingParams(
        model_architecture="unet",
        training_dataset_path=ds,
        initial_model=None,
        results_location=tmp_path,
        opt_con="adam",
        loss="dice_loss_macro",
        metric="dice_coef_macro",
        epochs=1,
        batch_size=2,
        # odd conv_layers -> not s2d eligible
        model_hyperparameters={"start_neurons": 2, "pool_layers": 2,
                               "conv_layers": 3},
        seed=0,
        train_forward_impl="s2d",
    )
    with pytest.raises(ValueError, match="s2d-eligible"):
        train_model(params, None)

    with pytest.raises(ValueError, match="train_forward_impl"):
        TrainingParams(
            model_architecture="unet",
            training_dataset_path=ds,
            initial_model=None,
            results_location=tmp_path,
            opt_con="adam",
            loss="dice_loss_macro",
            metric="dice_coef_macro",
            epochs=1,
            batch_size=2,
            train_forward_impl="nope",
        )
