"""bn_precise_val — the model-selection signal fix (VERDICT r4 #1).

Epoch-level ``val_<metric>``/``val_loss`` drive best-checkpoint
selection (``model_save_monitor``) and early stopping; computed with
rolling BatchNorm statistics they are nearly uninformative exactly when
statistics matter (r4 flagship: in-loop val_dice 0.724 for a model whose
true eval dice was 0.9999). With ``bn_precise_val=True`` (default) the
validation pass runs with precise-BN statistics refreshed under each
epoch's weights.
"""

import h5py
import jax
import numpy as np
import pytest

from synth import make_dataset


def _train(work, ds, **overrides):
    from oct_image_segmentation_models_tpu.training import (
        TrainingParams,
        train_model,
    )

    params = dict(
        model_architecture="unet",
        training_dataset_path=ds,
        initial_model=None,
        results_location=work,
        opt_con="adam",
        opt_params={"learning_rate": 1e-3},
        loss="dice_loss_macro",
        metric="dice_coef_macro",
        epochs=10,
        batch_size=2,
        model_hyperparameters={"start_neurons": 4, "pool_layers": 2},
        seed=3,
        # deterministic val-batch pairing: the quality-tracking test
        # recomputes the val metric with sequential batches
        shuffle=False,
    )
    params.update(overrides)
    return train_model(TrainingParams(**params), None)


@pytest.fixture(scope="module")
def paired_runs(tmp_path_factory):
    """Same data/seed/config, bn_precise_val on vs off."""
    work = tmp_path_factory.mktemp("precise_val")
    ds = make_dataset(work / "ds.hdf5", n_train=12, n_val=4, n_test=2,
                      h=32, w=48, num_classes=3, seed=21)
    folder_on = _train(work / "on", ds)
    folder_off = _train(work / "off", ds, bn_precise_val=False)
    return ds, folder_on, folder_off


def _epoch_stats(folder):
    stats_files = sorted(folder.glob("stats_epoch*.hdf5"))
    assert stats_files, folder
    with h5py.File(stats_files[-1], "r") as f:
        return {k: np.asarray(f[k]) for k in f}


def test_weight_trajectory_unchanged(paired_runs):
    """The val-metric semantics must not touch the training trajectory:
    final params are bitwise identical on vs off (the refresh never
    writes back into the train state, and draws no keys from the
    training RNG stream)."""
    from oct_image_segmentation_models_tpu.common.model_io import (
        load_model_and_config,
    )

    _ds, folder_on, folder_off = paired_runs
    on, _ = load_model_and_config(folder_on / "model_final.hdf5")
    off, _ = load_model_and_config(folder_off / "model_final.hdf5")
    for a, b in zip(
        jax.tree_util.tree_leaves(on.variables["params"]),
        jax.tree_util.tree_leaves(off.variables["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_metrics_identical_val_metrics_differ(paired_runs):
    """Train loss/metric sequences are identical (same steps, same data,
    same weights); ONLY the validation columns change semantics."""
    _ds, folder_on, folder_off = paired_runs
    s_on, s_off = _epoch_stats(folder_on), _epoch_stats(folder_off)
    np.testing.assert_array_equal(s_on["train_loss"], s_off["train_loss"])
    np.testing.assert_array_equal(s_on["train_acc"], s_off["train_acc"])
    assert not np.array_equal(s_on["val_acc"], s_off["val_acc"]), (
        "precise-BN val metrics are identical to rolling-stats metrics — "
        "refresh not effective"
    )


def test_val_signal_tracks_checkpoint_quality(paired_runs):
    """The last logged val_<metric> with bn_precise_val must match the
    quality of the correspondingly-finalized checkpoint (precise stats
    under last-epoch weights) — i.e. the selection signal now reads the
    number a deployed checkpoint would actually score."""
    from oct_image_segmentation_models_tpu.common.model_io import (
        load_model_and_config,
    )
    from oct_image_segmentation_models_tpu.ops import metrics as metrics_ops

    ds, folder_on, _ = paired_runs
    s_on = _epoch_stats(folder_on)
    logged = float(s_on["val_acc"][-1])

    # model_final.hdf5: last-epoch weights + precise stats (run completed
    # all epochs without early stop — patience 50 > 10).
    loaded, _cfg = load_model_and_config(folder_on / "model_final.hdf5")
    with h5py.File(ds, "r") as f:
        x = f["val_images"][:].astype(np.float32) / 255.0
        t = f["val_labels"][:]
    metric_fn = metrics_ops.dice_coef_macro(True, 3)
    vals = []
    for start in range(0, len(x), 2):  # batch_size=2, matching the loop
        out = loaded.module.apply(
            loaded.variables, x[start : start + 2], training=False
        )
        vals.append(float(metric_fn(t[start : start + 2], out)))
    true_quality = float(np.mean(vals))
    # Not bitwise: the in-loop refresh uses fold_in(key, epoch) dropout
    # draws vs the finalization's base key, so statistics differ by the
    # dropout-noise term. Must agree to well under the 0.27-dice gap the
    # rolling-stats signal showed at flagship scale.
    assert abs(logged - true_quality) < 0.02, (
        f"logged val metric {logged:.4f} vs true checkpoint quality "
        f"{true_quality:.4f}"
    )


def test_precise_val_attr_recorded(paired_runs):
    """training_params.hdf5 records the semantics both knobs ran with
    (ADVICE r4: downstream parity comparisons must see the departure)."""
    _ds, folder_on, folder_off = paired_runs
    for folder, want in ((folder_on, True), (folder_off, False)):
        with h5py.File(folder / "training_params.hdf5", "r") as f:
            assert bool(f.attrs["bn_precise_stats"]) is True
            assert bool(f.attrs["bn_precise_val"]) is want
            # completed run: the finalization actually happened, and the
            # applied-semantics attr (written at finalization) says so
            assert bool(f.attrs["bn_precise_stats_applied"]) is True


def test_resume_identity_includes_precise_val(tmp_path):
    """Resuming a run under the other val-metric semantics mixes two
    selection signals — the run-config check must reject it."""
    from oct_image_segmentation_models_tpu.training import (
        TrainingParams,
        train_model,
    )
    from oct_image_segmentation_models_tpu.training.training import (
        TRAIN_STATE_FILENAME,
    )

    ds = make_dataset(tmp_path / "ds.hdf5", n_train=4, n_val=2, n_test=2,
                      h=16, w=16, num_classes=3, seed=9)
    common = dict(
        training_dataset_path=ds,
        results_location=tmp_path / "run",
        opt_con="adam",
        loss="dice_loss_macro",
        metric="dice_coef_macro",
        batch_size=2,
        model_hyperparameters={"start_neurons": 2, "pool_layers": 2},
        seed=0,
        train_state_checkpoint=True,
    )
    folder = train_model(
        TrainingParams(
            model_architecture="unet", initial_model=None, epochs=1, **common
        ),
        None,
    )
    with pytest.raises(ValueError, match="bn_precise_val"):
        train_model(
            TrainingParams(
                model_architecture=None,
                initial_model=None,
                resume_train_state=folder / TRAIN_STATE_FILENAME,
                epochs=2,
                bn_precise_val=False,
                **{k: v for k, v in common.items()
                   if k != "results_location"},
                results_location=tmp_path / "resumed",
            ),
            None,
        )
