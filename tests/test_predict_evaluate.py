"""End-to-end: train -> predict -> evaluate on synthetic data, artifact and
semantic checks against the reference's output contract."""

import h5py
import numpy as np
import pytest

from oct_image_segmentation_models_tpu.common.dataset import Dataset
from oct_image_segmentation_models_tpu.evaluation import (
    EvaluationParameters,
    EvaluationSaveParams,
    evaluate_model,
)
from oct_image_segmentation_models_tpu.prediction import (
    PredictionParams,
    PredictionSaveParams,
    predict,
)
from oct_image_segmentation_models_tpu.training import TrainingParams, train_model

from synth import make_dataset


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    ds = make_dataset(root / "ds.hdf5", n_train=8, n_val=2, n_test=3, h=32,
                      w=48, num_classes=3, seed=1)
    folder = train_model(
        TrainingParams(
            model_architecture="unet",
            training_dataset_path=ds,
            initial_model=None,
            results_location=root,
            opt_con="adam",
            opt_params={"learning_rate": 2e-3},
            loss="dice_loss_macro",
            metric="dice_coef_macro",
            epochs=20,
            batch_size=2,
            model_hyperparameters={"start_neurons": 4, "pool_layers": 2},
            seed=0,
        ),
        None,
    )
    return root, ds, folder / "model_final.hdf5"


def test_predict_outputs(trained, tmp_path):
    root, ds, model_path = trained
    with h5py.File(ds, "r") as f:
        images = f["test_images"][:]
    out_dirs = [tmp_path / f"img_{i}" for i in range(len(images))]
    dataset = Dataset(
        images=images,
        image_masks=None,
        image_names=[p / "x.png" for p in out_dirs],
        image_output_dirs=out_dirs,
    )
    params = PredictionParams(
        model_path=model_path,
        mlflow_tracking_uri=None,
        mlflow_run_uuid=None,
        dataset=dataset,
        config_output_dir=tmp_path,
        save_params=PredictionSaveParams(categorical_pred=True),
        graph_search=True,
        batch_size=2,
    )
    outputs = predict(params)
    assert len(outputs) == len(images)
    assert (tmp_path / "prediction_params.hdf5").exists()
    for i, out in enumerate(outputs):
        d = out_dirs[i]
        assert (d / "prediction_info.hdf5").exists()
        assert (d / "segmentation_map.csv").exists()
        assert (d / "graph_search_prediction_info.hdf5").exists()
        assert (d / "gs_boundaries.csv").exists()
        assert out.predicted_labels.shape == images[i].shape[:2]
        assert out.categorical_pred.shape == (3,) + images[i].shape[:2]
        assert out.boundary_maps.shape == (2,) + images[i].shape[:2]
        assert out.gs_pred_segs.shape == (2, images[i].shape[1])
        with h5py.File(d / "prediction_info.hdf5", "r") as f:
            assert "predicted_labels" in f and "boundary_maps" in f
            assert "categorical_pred" in f
            assert f.attrs["predict_time"] >= 0
        # categorical_pred=True + png_images=True writes the per-class
        # PNGs — the exact configuration that CRASHES upstream
        # ('"categorical_pred_" + map_ind' with int map_ind, reference
        # `prediction/prediction.py:227`); fixed here, documented in
        # MIGRATION.md.
        for m in range(3):
            assert (d / f"categorical_pred_{m}.png").exists()
        # The min-path delineation should sit on the boundary-map ridges.
        for m in range(2):
            ridge_rows = np.argmax(out.boundary_maps[m], axis=0)
            cols = ridge_rows > 0
            if cols.sum():
                diff = np.abs(
                    out.gs_pred_segs[m][cols].astype(int) - ridge_rows[cols]
                )
                assert np.median(diff) <= 1.0


def test_evaluate_outputs(trained, tmp_path):
    root, ds, model_path = trained
    save_folder = tmp_path / "eval"
    params = EvaluationParameters(
        model_path=model_path,
        mlflow_tracking_uri=None,
        mlflow_run_uuid=None,
        test_dataset_path=ds,
        save_foldername=save_folder,
        save_params=EvaluationSaveParams(categorical_pred=True),
        graph_search=True,
        metrics=[
            "dice_coef_classes",
            "dice_coef_macro",
            "dice_coef_micro",
            "average_surface_distance",
            "hausdorff_distance",
        ],
        batch_size=2,
    )
    outputs = evaluate_model(params)
    assert len(outputs) == 3
    assert (save_folder / "eval_params.hdf5").exists()
    assert (save_folder / "overall_evaluation_results.hdf5").exists()
    assert (save_folder / "overall_evaluation_results.csv").exists()
    for i in range(3):
        d = save_folder / f"image_{i}"
        assert (d / "evaluation_results.hdf5").exists()
        assert (d / "gs_evaluation_results.hdf5").exists()
        with h5py.File(d / "evaluation_results.hdf5", "r") as f:
            assert f["dice_coef_classes"].shape == (3,)
            assert f["average_surface_distances"].shape == (2,)
            assert f["hausdorff_distances"].shape == (2,)
        with h5py.File(d / "gs_evaluation_results.hdf5", "r") as f:
            assert f["gs_pred_segs"].shape == (2, 48)
            assert f["errors"].shape == (2, 48)
    with h5py.File(save_folder / "overall_evaluation_results.hdf5", "r") as f:
        assert f["mean_abs_errors"].shape == (2,)
        assert f["mean_abs_errors_cols"].shape == (2, 48)
        assert f["errors"].shape == (3, 2, 48)
        assert f["gs_dice_coef_macro"].shape[0] == 3
        # trained model should delineate boundaries within a couple px
        assert np.all(f["mean_abs_errors"][:] < 4.0), f["mean_abs_errors"][:]
    csv = (save_folder / "overall_evaluation_results.csv").read_text()
    assert "Mean abs errors," in csv
    assert "Median absolute errors," in csv
    # Dice of a trained model should be decent on this easy synthetic set
    with h5py.File(save_folder / "overall_evaluation_results.hdf5", "r") as f:
        assert np.nanmean(f["mean_dice_coef_macro"][:]) > 0.55


def test_evaluate_empty_dataset_raises_clearly(trained, tmp_path):
    """A 0-image test set must fail with a clear message at the
    evaluate_model surface, not deep inside the device pipeline."""
    root, ds, model_path = trained
    empty = tmp_path / "empty.hdf5"
    with h5py.File(ds, "r") as src, h5py.File(empty, "w") as dst:
        for key in ("test_images", "test_labels", "test_images_source"):
            arr = src[key][:0]
            dst.create_dataset(key, data=arr)
    with pytest.raises(ValueError, match="contains no\\s+test images"):
        evaluate_model(
            EvaluationParameters(
                model_path=model_path,
                mlflow_tracking_uri=None,
                mlflow_run_uuid=None,
                test_dataset_path=empty,
                save_foldername=tmp_path / "eval_empty",
                save_params=EvaluationSaveParams(),
                graph_search=False,
                metrics=["dice_coef_macro"],
            )
        )


def test_evaluate_parallel_workers_match_serial(trained, tmp_path):
    """num_workers=2 (spawn process pool for the per-image host phase)
    must produce bitwise-identical per-image and overall artifacts."""
    root, ds, model_path = trained
    metrics = [
        "dice_coef_classes",
        "dice_coef_macro",
        "dice_coef_micro",
        "average_surface_distance",
        "hausdorff_distance",
    ]

    def run(folder, workers):
        evaluate_model(
            EvaluationParameters(
                model_path=model_path,
                mlflow_tracking_uri=None,
                mlflow_run_uuid=None,
                test_dataset_path=ds,
                save_foldername=folder,
                save_params=EvaluationSaveParams(categorical_pred=True),
                graph_search=True,
                metrics=metrics,
                batch_size=2,
                num_workers=workers,
            )
        )

    run(tmp_path / "serial", 0)
    run(tmp_path / "par", 2)

    for i in range(3):
        for fname in ("evaluation_results.hdf5", "gs_evaluation_results.hdf5"):
            with h5py.File(tmp_path / "serial" / f"image_{i}" / fname) as a, \
                 h5py.File(tmp_path / "par" / f"image_{i}" / fname) as b:
                assert set(a.keys()) == set(b.keys())
                for key in a.keys():
                    np.testing.assert_array_equal(
                        a[key][()], b[key][()], err_msg=f"image_{i}/{fname}/{key}"
                    )
    with h5py.File(tmp_path / "serial" / "overall_evaluation_results.hdf5") as a, \
         h5py.File(tmp_path / "par" / "overall_evaluation_results.hdf5") as b:
        for key in a.keys():
            np.testing.assert_array_equal(a[key][()], b[key][()], err_msg=key)


def test_predict_parallel_workers_match_serial(trained, tmp_path):
    """num_workers=2 (spawn process pool for the per-image artifact
    phase, `common/host_pool.py`) must produce identical per-image
    HDF5/CSV artifacts and identical returned outputs."""
    root, ds, model_path = trained
    with h5py.File(ds, "r") as f:
        images = f["test_images"][:]

    def run(folder, workers):
        out_dirs = [folder / f"img_{i}" for i in range(len(images))]
        params = PredictionParams(
            model_path=model_path,
            mlflow_tracking_uri=None,
            mlflow_run_uuid=None,
            dataset=Dataset(
                images=images,
                image_masks=None,
                image_names=[p / "x.png" for p in out_dirs],
                image_output_dirs=out_dirs,
            ),
            config_output_dir=folder,
            save_params=PredictionSaveParams(categorical_pred=True),
            graph_search=True,
            batch_size=2,
            num_workers=workers,
        )
        folder.mkdir(parents=True, exist_ok=True)
        return predict(params), out_dirs

    serial_out, serial_dirs = run(tmp_path / "serial", 0)
    par_out, par_dirs = run(tmp_path / "par", 2)

    assert len(par_out) == len(serial_out) == len(images)
    for a, b in zip(serial_out, par_out):
        np.testing.assert_array_equal(a.predicted_labels, b.predicted_labels)
        np.testing.assert_array_equal(a.gs_pred_segs, b.gs_pred_segs)
    for i in range(len(images)):
        for fname in (
            "prediction_info.hdf5",
            "graph_search_prediction_info.hdf5",
        ):
            with h5py.File(serial_dirs[i] / fname) as a, \
                 h5py.File(par_dirs[i] / fname) as b:
                assert set(a.keys()) == set(b.keys())
                for key in a.keys():
                    np.testing.assert_array_equal(
                        a[key][()], b[key][()], err_msg=f"img_{i}/{fname}/{key}"
                    )
        for csv in ("segmentation_map.csv", "gs_boundaries.csv"):
            assert (serial_dirs[i] / csv).read_text() == (
                par_dirs[i] / csv
            ).read_text()


def test_predict_without_graph_search(trained, tmp_path):
    root, ds, model_path = trained
    with h5py.File(ds, "r") as f:
        images = f["test_images"][:2]
    out_dirs = [tmp_path / f"img_{i}" for i in range(2)]
    dataset = Dataset(images, None, [p / "x" for p in out_dirs], out_dirs)
    outputs = predict(
        PredictionParams(
            model_path=model_path,
            mlflow_tracking_uri=None,
            mlflow_run_uuid=None,
            dataset=dataset,
            config_output_dir=tmp_path,
            save_params=PredictionSaveParams(png_images=False),
            graph_search=False,
            batch_size=2,
        )
    )
    assert outputs[0].gs_pred_segs is None
    assert not (out_dirs[0] / "graph_search_prediction_info.hdf5").exists()


def test_predict_heterogeneous_image_shapes(trained, tmp_path):
    """Mixed B-scan sizes in ONE predict() call (reference parity: the
    upstream driver predicts image-by-image on a dynamic-shape model,
    `prediction/prediction.py:70-81`): outputs and artifacts must be
    bitwise-identical to per-shape single-bucket calls, reassembled in
    input order."""
    from synth import make_layered_sample

    root, ds, model_path = trained
    rng = np.random.default_rng(11)
    img_a0 = make_layered_sample(rng, 32, 48, 3)[0][..., None]
    img_b0 = make_layered_sample(rng, 48, 64, 3)[0][..., None]
    img_a1 = make_layered_sample(rng, 32, 48, 3)[0][..., None]
    mixed = [img_a0, img_b0, img_a1]  # interleaved shapes

    def run(images, sub):
        (tmp_path / sub).mkdir(parents=True, exist_ok=True)
        out_dirs = [tmp_path / sub / f"img_{i}" for i in range(len(images))]
        outputs = predict(
            PredictionParams(
                model_path=model_path,
                mlflow_tracking_uri=None,
                mlflow_run_uuid=None,
                dataset=Dataset(
                    images, None, [p / "x" for p in out_dirs], out_dirs
                ),
                config_output_dir=tmp_path / sub,
                save_params=PredictionSaveParams(png_images=False),
                graph_search=True,
                batch_size=2,
            )
        )
        return outputs, out_dirs

    mixed_out, mixed_dirs = run(mixed, "mixed")
    a_out, _ = run(np.stack([img_a0, img_a1]), "bucket_a")
    b_out, _ = run(np.stack([img_b0]), "bucket_b")

    assert len(mixed_out) == 3
    # order preserved, shapes per image
    assert mixed_out[0].predicted_labels.shape == (32, 48)
    assert mixed_out[1].predicted_labels.shape == (48, 64)
    assert mixed_out[2].predicted_labels.shape == (32, 48)
    # bitwise equality with the single-shape calls
    for got, want in (
        (mixed_out[0], a_out[0]),
        (mixed_out[1], b_out[0]),
        (mixed_out[2], a_out[1]),
    ):
        assert np.array_equal(got.predicted_labels, want.predicted_labels)
        assert np.array_equal(got.categorical_pred, want.categorical_pred)
        assert np.array_equal(got.boundary_maps, want.boundary_maps)
        assert np.array_equal(got.gs_pred_segs, want.gs_pred_segs)
    for d in mixed_dirs:
        assert (d / "prediction_info.hdf5").exists()
        assert (d / "graph_search_prediction_info.hdf5").exists()


def test_predict_heterogeneous_shapes_gs_plots(trained, tmp_path):
    """Wider-image-FIRST heterogeneous predict with PNG artifacts on
    (r5 review finding): the dataset-wide col_error_range is derived
    from image 0's width, so the narrower image's graph-search overlay
    plot used to crash matplotlib (x of width 64 vs y of width 48); a
    defaulted range must mean full per-image width."""
    from synth import make_layered_sample

    root, ds, model_path = trained
    rng = np.random.default_rng(13)
    img_wide = make_layered_sample(rng, 48, 64, 3)[0][..., None]
    img_narrow = make_layered_sample(rng, 32, 48, 3)[0][..., None]
    (tmp_path / "het_png").mkdir(parents=True, exist_ok=True)
    out_dirs = [tmp_path / "het_png" / f"img_{i}" for i in range(2)]
    predict(
        PredictionParams(
            model_path=model_path,
            mlflow_tracking_uri=None,
            mlflow_run_uuid=None,
            dataset=Dataset(
                [img_wide, img_narrow],
                None,
                [p / "x" for p in out_dirs],
                out_dirs,
            ),
            config_output_dir=tmp_path / "het_png",
            save_params=PredictionSaveParams(png_images=True),
            graph_search=True,
            batch_size=2,
        )
    )
    for d in out_dirs:
        assert (d / "gs_predicted_boundaries_ovelay_plot.png").exists()


def test_batch_size_validated(trained, tmp_path):
    """batch_size<=0 fails loudly at parameter construction, not deep
    inside run_pipeline (r5 review finding)."""
    root, ds, model_path = trained
    img = np.zeros((32, 48, 1), np.uint8)
    for bad in (0, -1):
        with pytest.raises(ValueError, match="batch_size"):
            PredictionParams(
                model_path=model_path,
                mlflow_tracking_uri=None,
                mlflow_run_uuid=None,
                dataset=Dataset(
                    [img], None, [tmp_path / "x"], [tmp_path / "o"]
                ),
                config_output_dir=tmp_path,
                save_params=PredictionSaveParams(),
                graph_search=False,
                batch_size=bad,
            )
        with pytest.raises(ValueError, match="batch_size"):
            EvaluationParameters(
                model_path=model_path,
                mlflow_tracking_uri=None,
                mlflow_run_uuid=None,
                test_dataset_path=ds,
                save_foldername=tmp_path / "ev",
                save_params=EvaluationSaveParams(),
                graph_search=False,
                metrics=["dice_coef_macro"],
                batch_size=bad,
            )


def test_evaluate_metric_subset_no_graph_search(trained, tmp_path):
    root, ds, model_path = trained
    save_folder = tmp_path / "eval2"
    outputs = evaluate_model(
        EvaluationParameters(
            model_path=model_path,
            mlflow_tracking_uri=None,
            mlflow_run_uuid=None,
            test_dataset_path=ds,
            save_foldername=save_folder,
            save_params=EvaluationSaveParams(png_images=False),
            graph_search=False,
            metrics=["dice_coef_macro"],
            batch_size=2,
        )
    )
    assert outputs[0].errors is None
    with h5py.File(save_folder / "image_0" / "evaluation_results.hdf5") as f:
        assert "dice_coef_macro" in f
        assert "hausdorff_distances" not in f
    with h5py.File(save_folder / "overall_evaluation_results.hdf5") as f:
        assert "mean_dice_coef_macro" in f
        assert "mean_abs_errors" not in f


def test_invalid_metric_rejected(trained, tmp_path):
    root, ds, model_path = trained
    with pytest.raises(ValueError):
        EvaluationParameters(
            model_path=model_path,
            mlflow_tracking_uri=None,
            mlflow_run_uuid=None,
            test_dataset_path=ds,
            save_foldername=tmp_path,
            save_params=EvaluationSaveParams(),
            graph_search=False,
            metrics=["nope"],
        )


def test_predict_fast_tie_parity(trained, tmp_path):
    """minpath_tie_parity="fast" runs the whole predict surface and its
    delineations stay within the tie budget of the exact mode (both are
    cost-optimal; on non-plateau maps they are usually identical)."""
    root, ds, model_path = trained
    with h5py.File(ds, "r") as f:
        images = f["test_images"][:]

    def run(mode, sub):
        (tmp_path / sub).mkdir(exist_ok=True)
        out_dirs = [tmp_path / sub / f"img_{i}" for i in range(len(images))]
        dataset = Dataset(
            images=images,
            image_masks=None,
            image_names=[p / "x.png" for p in out_dirs],
            image_output_dirs=out_dirs,
        )
        return predict(
            PredictionParams(
                model_path=model_path,
                mlflow_tracking_uri=None,
                mlflow_run_uuid=None,
                dataset=dataset,
                config_output_dir=tmp_path / sub,
                save_params=PredictionSaveParams(png_images=False),
                graph_search=True,
                batch_size=2,
                minpath_tie_parity=mode,
            )
        )

    exact = run("exact", "exact")
    fast = run("fast", "fast")
    for e, f_ in zip(exact, fast):
        assert f_.gs_pred_segs.shape == e.gs_pred_segs.shape
        mae = np.abs(
            f_.gs_pred_segs.astype(int) - e.gs_pred_segs.astype(int)
        ).mean()
        assert mae < 0.05, mae


def test_predict_bfloat16_compute_dtype(trained, tmp_path):
    """compute_dtype="bfloat16" runs the whole predict surface on the
    s2d fast path; labels agree with float32 on all but near-tie pixels
    and the knob is validated."""
    root, ds, model_path = trained
    with h5py.File(ds, "r") as f:
        images = f["test_images"][:]

    def run(dtype, sub):
        (tmp_path / sub).mkdir(exist_ok=True)
        out_dirs = [tmp_path / sub / f"img_{i}" for i in range(len(images))]
        dataset = Dataset(
            images=images,
            image_masks=None,
            image_names=[p / "x.png" for p in out_dirs],
            image_output_dirs=out_dirs,
        )
        return predict(
            PredictionParams(
                model_path=model_path,
                mlflow_tracking_uri=None,
                mlflow_run_uuid=None,
                dataset=dataset,
                config_output_dir=tmp_path / sub,
                save_params=PredictionSaveParams(png_images=False),
                graph_search=False,
                batch_size=2,
                compute_dtype=dtype,
            )
        )

    f32 = run("float32", "f32")
    bf16 = run("bfloat16", "bf16")
    for a, b in zip(f32, bf16):
        agree = (a.predicted_labels == b.predicted_labels).mean()
        assert agree > 0.9, agree

    with pytest.raises(ValueError, match="compute_dtype"):
        run("float16", "bad")


def test_invalid_tie_parity_rejected(trained, tmp_path):
    root, ds, model_path = trained
    with pytest.raises(ValueError, match="minpath_tie_parity"):
        PredictionParams(
            model_path=model_path,
            mlflow_tracking_uri=None,
            mlflow_run_uuid=None,
            dataset=Dataset(
                images=np.zeros((1, 32, 48, 1), np.uint8),
                image_masks=None,
                image_names=[tmp_path / "x.png"],
                image_output_dirs=[tmp_path],
            ),
            config_output_dir=tmp_path,
            save_params=PredictionSaveParams(),
            minpath_tie_parity="bogus",
        )
    with pytest.raises(ValueError, match="minpath_tie_parity"):
        EvaluationParameters(
            model_path=model_path,
            mlflow_tracking_uri=None,
            mlflow_run_uuid=None,
            test_dataset_path=ds,
            save_foldername=tmp_path,
            save_params=EvaluationSaveParams(),
            graph_search=False,
            metrics=["dice_coef_macro"],
            minpath_tie_parity="bogus",
        )


def test_workflow_surfaces_default_to_fast_tie_parity():
    """The documented production default (MIGRATION.md divergences):
    every workflow surface defaults minpath_tie_parity="fast" while the
    low-level graph-search/ops APIs stay "exact". Pins the r3 flip so a
    silent revert (changing user outputs AND the bench headline's
    meaning) cannot pass the suite."""
    import inspect

    from oct_image_segmentation_models_tpu.cli import build_parser
    from oct_image_segmentation_models_tpu.common.export import (
        export_inference_pipeline,
    )
    from oct_image_segmentation_models_tpu.evaluation.evaluation_parameters import (
        EvaluationParameters,
    )
    from oct_image_segmentation_models_tpu.ops import minpath
    from oct_image_segmentation_models_tpu.prediction.prediction_parameters import (
        PredictionParams,
    )
    from oct_image_segmentation_models_tpu.prediction.streaming import (
        VolumeSegmenter,
    )

    def default_of(fn, name="minpath_tie_parity"):
        return inspect.signature(fn).parameters[name].default

    assert default_of(PredictionParams.__init__) == "fast"
    assert default_of(EvaluationParameters.__init__) == "fast"
    assert default_of(VolumeSegmenter.__init__) == "fast"
    assert default_of(export_inference_pipeline) == "fast"

    parser = build_parser()
    for cmd, m, d, o in (
        ("predict", "model.h5", "ds.h5", "out"),
        ("evaluate", "model.h5", "ds.h5", "out"),
        ("export", "model.h5", "out.h5", None),
    ):
        argv = [cmd, m, d] + ([o] if o else [])
        args = parser.parse_args(argv)
        assert args.minpath_tie_parity == "fast", cmd

    # The low-level APIs keep reference bit-parity as their contract.
    assert default_of(minpath.delineate, "tie_parity") == "exact"


def test_num_workers_auto_resolution(trained, tmp_path, monkeypatch):
    """num_workers='auto' (the r4 default on every workflow surface)
    resolves to min(4, cpu_count-1): serial on small hosts, bounded
    parallel elsewhere; invalid values raise."""
    import os as _os

    from oct_image_segmentation_models_tpu.common.host_pool import (
        resolve_num_workers,
    )

    monkeypatch.setattr(_os, "cpu_count", lambda: 1)
    assert resolve_num_workers("auto") == 0
    monkeypatch.setattr(_os, "cpu_count", lambda: 8)
    assert resolve_num_workers("auto") == 4
    monkeypatch.setattr(_os, "cpu_count", lambda: 3)
    assert resolve_num_workers("auto") == 2
    assert resolve_num_workers(7) == 7
    for bad in (-1, "many", True, 2.5):
        with pytest.raises(ValueError):
            resolve_num_workers(bad)

    # the parameter objects resolve at construction (int thereafter)
    root, ds, model_path = trained
    params = EvaluationParameters(
        model_path=model_path,
        mlflow_tracking_uri=None,
        mlflow_run_uuid=None,
        test_dataset_path=ds,
        save_foldername=tmp_path,
        save_params=EvaluationSaveParams(),
        graph_search=False,
        metrics=["dice_coef_macro"],
    )
    assert isinstance(params.num_workers, int) and params.num_workers >= 0
