"""DeepLabV3+ LEARNS (VERDICT r4 #3).

The architecture had forward parity (Keras 1e-3,
tests/test_keras_parity.py) and a one-epoch training smoke, but zero
convergence evidence: BN-in-ResNet + precise-BN finalization +
s2d-ineligible backward paths compose under real training here for the
first time. Reference trains DeepLab through the same driver
(`/root/reference/oct_image_segmentation_models/models/deeplabv3plus.py:86-125`).

Small geometry (48x64, stride-4-safe), random-init backbone (ImageNet
values are environment-blocked offline), 2 seeds through the REAL
training driver, both final checkpoints through the full evaluation
driver (graph search + dice). Slow (~6-10 min: ResNet50 fwd+bwd on a
1-core CPU); bands measured r5 at exactly this config (prototype run,
PLAN.md): dice [0.961, 0.957], gs boundary MAE [0.75, 0.83] px per
seed (0, 1).
"""

from __future__ import annotations

import h5py
import numpy as np
import pytest

from synth import make_dataset

H_IMG, W_IMG, NUM_CLASSES = 48, 64, 3
SEEDS = (0, 1)
EPOCHS = 20


@pytest.fixture(scope="module")
def deeplab_runs(tmp_path_factory):
    from oct_image_segmentation_models_tpu.evaluation import (
        EvaluationParameters,
        EvaluationSaveParams,
        evaluate_model,
    )
    from oct_image_segmentation_models_tpu.training import (
        TrainingParams,
        train_model,
    )

    work = tmp_path_factory.mktemp("deeplab_learning")
    ds = make_dataset(work / "ds.hdf5", n_train=12, n_val=4, n_test=4,
                      h=H_IMG, w=W_IMG, num_classes=NUM_CLASSES, seed=33)
    # 3-channel inputs (the reference's DeepLab consumes RGB through the
    # caffe-style ResNet preprocess)
    with h5py.File(ds, "r+") as f:
        for split in ("train", "val", "test"):
            imgs = f[f"{split}_images"][:]
            del f[f"{split}_images"]
            f[f"{split}_images"] = np.repeat(imgs, 3, axis=-1)

    scores = []
    for seed in SEEDS:
        folder = train_model(
            TrainingParams(
                model_architecture="deeplabv3plus",
                training_dataset_path=ds,
                initial_model=None,
                results_location=work / f"run{seed}",
                opt_con="adam",
                opt_params={"learning_rate": 1e-3},
                loss="dice_loss_macro",
                metric="dice_coef_macro",
                epochs=EPOCHS,
                batch_size=2,
                seed=seed,
            ),
            None,
        )
        out = work / f"eval{seed}"
        evaluate_model(
            EvaluationParameters(
                model_path=folder / "model_final.hdf5",
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
        scores.append((dice, mae))
    print(f"\ndeeplab learning (dice, gs-MAE px) per seed: {scores}")
    return scores


def test_deeplab_converges_every_seed(deeplab_runs):
    """Held-out dice after 20 epochs from random init: every seed must
    clear the convergence bar (r5 measured 0.957-0.961 per seed at this
    geometry; an untrained model scores ~0.3)."""
    dice = [d for d, _ in deeplab_runs]
    assert min(dice) > 0.85, f"DeepLabV3+ failed to converge: {dice}"


def test_deeplab_boundaries_converge_every_seed(deeplab_runs):
    """Held-out graph-search boundary MAE: every seed within the band
    (r5 measured 0.75-0.83 px; the stride-4 decoder's bilinear upsample
    makes this looser than the U-Net's sub-0.1 px)."""
    mae = [m for _, m in deeplab_runs]
    assert max(mae) < 2.0, f"DeepLabV3+ boundaries off: {mae}"
