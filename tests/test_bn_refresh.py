"""Precise-BN finalization (ops/bn_refresh.py) — algebra + trainer wiring."""

import flax.linen as nn
import h5py
import jax
import numpy as np
import pytest

from oct_image_segmentation_models_tpu.ops.bn_refresh import (
    compute_precise_batch_stats,
)

from synth import make_dataset


class _ConvBN(nn.Module):
    """Minimal module honoring the training-forward contract."""

    features: int = 3

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(self.features, (1, 1), use_bias=True)(x)
        x = nn.BatchNorm(
            use_running_average=not training, momentum=0.99, epsilon=1e-3
        )(x)
        return x


def _population_stats_of_conv(params, batches):
    """Direct numpy population stats of the conv output (per channel,
    over batch+spatial of ALL batches) — what precise BN must recover."""
    w = np.asarray(params["Conv_0"]["kernel"])[0, 0]  # (Cin, Cout)
    b = np.asarray(params["Conv_0"]["bias"])
    ys = [x.reshape(-1, x.shape[-1]) @ w + b for x in batches]
    y = np.concatenate(ys, axis=0)
    return y.mean(axis=0), y.var(axis=0)


def test_precise_stats_match_population():
    rng = np.random.default_rng(0)
    batches = [rng.normal(2.0, 3.0, (4, 8, 8, 2)).astype(np.float32)
               for _ in range(5)]
    module = _ConvBN()
    variables = module.init(jax.random.PRNGKey(0), batches[0])
    stats = compute_precise_batch_stats(
        module,
        variables["params"],
        variables["batch_stats"],
        batches,
        jax.random.PRNGKey(1),
    )
    want_mean, want_var = _population_stats_of_conv(
        variables["params"], batches
    )
    got = stats["BatchNorm_0"]
    np.testing.assert_allclose(np.asarray(got["mean"]), want_mean,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["var"]), want_var,
                               rtol=2e-3, atol=2e-4)


def test_precise_stats_anchor_independent():
    """The algebraic extraction cancels the anchor statistics exactly —
    any same-shaped batch_stats tree gives the same result (up to the
    1/(1-m) f32 amplification)."""
    rng = np.random.default_rng(1)
    batches = [rng.normal(0, 1, (2, 4, 4, 2)).astype(np.float32)
               for _ in range(3)]
    module = _ConvBN()
    variables = module.init(jax.random.PRNGKey(0), batches[0])
    a = compute_precise_batch_stats(
        module, variables["params"], variables["batch_stats"], batches,
        jax.random.PRNGKey(2),
    )
    skewed = jax.tree_util.tree_map(
        lambda x: x + 7.5, variables["batch_stats"]
    )
    b = compute_precise_batch_stats(
        module, variables["params"], skewed, batches, jax.random.PRNGKey(2),
    )
    for pa, pb in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=1e-3, atol=1e-3
        )


def test_anchor_values_never_enter_the_computation():
    """r5 (ADVICE r4): the recurrence is anchored at a ZEROED stats tree
    inside the extraction jit, so two calls with wildly different anchor
    trees are BITWISE equal — no 1/(1-m) cancellation amplification of
    the anchor's rounding remains."""
    rng = np.random.default_rng(4)
    batches = [rng.normal(0, 1, (2, 4, 4, 2)).astype(np.float32)
               for _ in range(3)]
    module = _ConvBN()
    variables = module.init(jax.random.PRNGKey(0), batches[0])
    a = compute_precise_batch_stats(
        module, variables["params"], variables["batch_stats"], batches,
        jax.random.PRNGKey(2),
    )
    skewed = jax.tree_util.tree_map(
        lambda x: x + 1e6, variables["batch_stats"]
    )
    b = compute_precise_batch_stats(
        module, variables["params"], skewed, batches, jax.random.PRNGKey(2),
    )
    for pa, pb in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_deterministic_mode_drops_dropout_keeps_batch_stats():
    """deterministic=True collects statistics under a dropout-OFF
    forward (the modules' stats_mode): rng-independent, and — on a
    module WITH dropout — different from the dropout-active collection
    downstream of the Dropout layer, while layers upstream match."""
    from oct_image_segmentation_models_tpu.models import get_model_class
    from oct_image_segmentation_models_tpu.ops.bn_refresh import BNRefresher

    container = get_model_class("unet")(
        input_channels=1, num_classes=3, image_height=16, image_width=16,
        start_neurons=2, pool_layers=2, conv_layers=1,
    )
    module = container.build_model()
    variables = module.init(
        jax.random.PRNGKey(0), np.zeros((1, 16, 16, 1), np.float32),
        training=False,
    )
    nprng = np.random.default_rng(6)
    batches = [nprng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32)
               for _ in range(3)]

    det = BNRefresher(module, deterministic=True)
    d1 = det(variables["params"], variables["batch_stats"], batches,
             rng=jax.random.PRNGKey(1))
    d2 = det(variables["params"], variables["batch_stats"], batches,
             rng=jax.random.PRNGKey(999))
    for pa, pb in zip(
        jax.tree_util.tree_leaves(d1), jax.tree_util.tree_leaves(d2)
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    sto = BNRefresher(module, deterministic=False)
    s = sto(variables["params"], variables["batch_stats"], batches,
            rng=jax.random.PRNGKey(1))
    # With pool_layers=2 / conv_layers=1, ConvBlock_0/1 sit before the
    # bottleneck Dropout (identical collection), the decoder blocks
    # after it (dropout noise enters the statistics).
    np.testing.assert_array_equal(
        np.asarray(d1["ConvBlock_0"]["BatchNorm_0"]["mean"]),
        np.asarray(s["ConvBlock_0"]["BatchNorm_0"]["mean"]),
    )
    post = [
        k for k in d1
        if int(k.split("_")[1]) > 2  # blocks after the bottleneck
    ]
    assert post
    assert any(
        not np.allclose(
            np.asarray(d1[k]["BatchNorm_0"]["var"]),
            np.asarray(s[k]["BatchNorm_0"]["var"]),
            rtol=1e-6,
        )
        for k in post
    ), "dropout had no effect downstream — stats_mode wiring suspect"


def test_empty_batches_raise():
    module = _ConvBN()
    variables = module.init(
        jax.random.PRNGKey(0), np.zeros((1, 4, 4, 2), np.float32)
    )
    with pytest.raises(ValueError):
        compute_precise_batch_stats(
            module, variables["params"], variables["batch_stats"], [],
            jax.random.PRNGKey(0),
        )


@pytest.fixture(scope="module")
def trained_small(tmp_path_factory):
    """One short training run (precise BN on, the default) + its data."""
    from oct_image_segmentation_models_tpu.training import (
        TrainingParams,
        train_model,
    )

    work = tmp_path_factory.mktemp("bn_refresh")
    ds = make_dataset(work / "ds.hdf5", n_train=12, n_val=4, n_test=2,
                      h=32, w=48, num_classes=3, seed=33)
    params = dict(
        model_architecture="unet",
        training_dataset_path=ds,
        initial_model=None,
        opt_con="adam",
        opt_params={"learning_rate": 1e-3},
        loss="dice_loss_macro",
        metric="dice_coef_macro",
        epochs=12,
        batch_size=2,
        model_hyperparameters={"start_neurons": 4, "pool_layers": 2},
        seed=1,
    )
    folder_on = train_model(
        TrainingParams(results_location=work / "on", **params), None
    )
    folder_off = train_model(
        TrainingParams(
            results_location=work / "off", bn_precise_stats=False, **params
        ),
        None,
    )
    return ds, folder_on, folder_off


def test_trainer_finalizes_precise_stats(trained_small):
    """The shipped checkpoint's eval-mode quality must match its
    train-mode (batch-stats) quality — the r4 bug was a 0.51-vs-0.99
    held-out dice gap from stale rolling statistics."""
    from oct_image_segmentation_models_tpu.common.model_io import (
        load_model_and_config,
    )

    ds, folder_on, _ = trained_small
    loaded, _cfg = load_model_and_config(folder_on / "model_final.hdf5")
    with h5py.File(ds, "r") as f:
        x = f["val_images"][:].astype(np.float32) / 255.0
        t = f["val_labels"][:][..., 0]

    variables = {
        "params": loaded.variables["params"],
        "batch_stats": loaded.variables["batch_stats"],
    }
    out_eval = loaded.module.apply(variables, x, training=False)
    out_train = loaded.module.apply(
        variables,
        x,
        training=True,
        rngs={"dropout": jax.random.PRNGKey(0)},
        mutable=["batch_stats"],
    )[0]

    def dice_macro(out):
        p = np.argmax(np.asarray(out), -1)
        return np.mean(
            [
                2 * ((p == c) & (t == c)).sum()
                / max((p == c).sum() + (t == c).sum(), 1)
                for c in range(3)
            ]
        )

    d_eval, d_train = dice_macro(out_eval), dice_macro(out_train)
    assert d_eval > d_train - 0.05, (
        f"eval-mode dice {d_eval:.3f} lags train-mode {d_train:.3f}: "
        "precise-BN finalization not effective"
    )


def test_bn_precise_stats_off_keeps_rolling_stats(trained_small):
    """bn_precise_stats=False restores reference-exact finalization:
    the two runs share weights-trajectory determinism (same seed), so
    params match and ONLY the saved statistics differ."""
    from oct_image_segmentation_models_tpu.common.model_io import (
        load_model_and_config,
    )

    _ds, folder_on, folder_off = trained_small
    on, _ = load_model_and_config(folder_on / "model_final.hdf5")
    off, _ = load_model_and_config(folder_off / "model_final.hdf5")
    p_on = jax.tree_util.tree_leaves(on.variables["params"])
    p_off = jax.tree_util.tree_leaves(off.variables["params"])
    for a, b in zip(p_on, p_off):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s_on = np.concatenate(
        [
            np.asarray(x).ravel()
            for x in jax.tree_util.tree_leaves(on.variables["batch_stats"])
        ]
    )
    s_off = np.concatenate(
        [
            np.asarray(x).ravel()
            for x in jax.tree_util.tree_leaves(off.variables["batch_stats"])
        ]
    )
    assert not np.array_equal(s_on, s_off)


def test_precise_stats_via_s2d_train_forward_match_parity():
    """compute_precise_batch_stats runs through whichever compute module
    the trainer used; the S2DTrainForward path (the flagship bf16/s2d
    config, used by bench.py's train phase and by train_model's auto
    default) must recover the same population statistics as the parity
    UNetModule (same dropout rng scope, f32 tolerance)."""
    from oct_image_segmentation_models_tpu.models import get_model_class
    from oct_image_segmentation_models_tpu.ops.s2d_train import (
        S2DTrainForward,
    )

    container = get_model_class("unet")(
        input_channels=1,
        num_classes=3,
        image_height=16,
        image_width=16,
        start_neurons=4,
        pool_layers=2,
        conv_layers=2,
    )
    module = container.build_model()
    rng = jax.random.PRNGKey(0)
    variables = module.init(
        rng, np.zeros((1, 16, 16, 1), np.float32), training=False
    )
    fwd = S2DTrainForward(container.get_config())

    nprng = np.random.default_rng(3)
    batches = [nprng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32)
               for _ in range(3)]
    key = jax.random.PRNGKey(5)
    got_parity = compute_precise_batch_stats(
        module, variables["params"], variables["batch_stats"], batches, key
    )
    got_s2d = compute_precise_batch_stats(
        fwd, variables["params"], variables["batch_stats"], batches, key
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(got_parity),
        jax.tree_util.tree_leaves(got_s2d),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_finalization_survives_train_set_smaller_than_batch(tmp_path):
    """Precomputed augmentation modes let batch_size exceed the RAW
    training-image count (the generator guard counts augmented
    samples); precise-BN finalization must fall back to one all-images
    batch instead of zero batches (r4 code-review finding: n_full=0
    crashed at finalization, after training had already succeeded)."""
    from oct_image_segmentation_models_tpu.training import (
        TrainingParams,
        train_model,
    )

    ds = make_dataset(tmp_path / "ds.hdf5", n_train=2, n_val=2, n_test=2,
                      h=16, w=16, num_classes=3, seed=5)
    folder = train_model(
        TrainingParams(
            model_architecture="unet",
            training_dataset_path=ds,
            initial_model=None,
            results_location=tmp_path,
            opt_con="adam",
            loss="dice_loss_macro",
            metric="dice_coef_macro",
            epochs=1,
            batch_size=4,  # > 2 raw images; aug_mode="all" with 2 augs
            # gives 2 x 2 = 4 generator samples, so the guard passes
            model_hyperparameters={"start_neurons": 2, "pool_layers": 2},
            augmentations=[
                {"name": "flip", "arguments": {"flip_type": "left-right"}},
                {"name": "flip", "arguments": {"flip_type": "up-down"}},
            ],
            aug_mode="all",
            aug_fly=False,
            seed=0,
        ),
        None,
    )
    assert (folder / "model_final.hdf5").exists()
