"""Prediction configuration — reference
`prediction/prediction_parameters.py:12-63` (same surface; the model is
loaded at construction and ``num_classes`` is derived from it)."""

from __future__ import annotations

from pathlib import Path, PurePosixPath
from typing import Union

from ..common import host_pool, utils
from ..common.dataset import Dataset


class PredictionSaveParams:
    def __init__(
        self,
        predicted_labels: bool = True,
        categorical_pred: bool = False,
        png_images: bool = True,
        boundary_maps: bool = True,
    ) -> None:
        self.predicted_labels = predicted_labels
        self.categorical_pred = categorical_pred
        self.png_images = png_images
        self.boundary_maps = boundary_maps


class PredictionParams:
    def __init__(
        self,
        model_path: Union[Path, PurePosixPath],
        mlflow_tracking_uri: Union[str, None],
        mlflow_run_uuid: Union[str, None],
        dataset: Dataset,
        config_output_dir: Path,
        save_params: PredictionSaveParams,
        graph_search: bool = False,
        trim_maps: bool = False,
        trim_ref_ind: int = 0,
        trim_window: tuple = (0, 0),
        col_error_range: tuple = None,
        batch_size: int = 8,
        minpath_tie_parity: str = "fast",
        compute_dtype: str = "float32",
        num_workers="auto",
    ) -> None:
        self.model_path = model_path
        self.mlflow_tracking_uri = mlflow_tracking_uri
        self.mlflow_run_uuid = mlflow_run_uuid
        self.dataset = dataset
        self.loaded_model, self.model_config = utils.load_model_and_config(
            model_path,
            mlflow_tracking_uri=mlflow_tracking_uri,
            mlflow_run_uuid=mlflow_run_uuid,
        )
        self.num_classes = self.loaded_model.output_classes
        self.config_output_dir = Path(config_output_dir)
        self.save_params = save_params
        self.graph_search = graph_search
        self.trim_maps = trim_maps
        self.trim_ref_ind = trim_ref_ind
        self.trim_window = trim_window
        # Device batch size for the fused pipeline (the reference is
        # hardwired to per-image batches, `prediction/prediction.py:75-81`).
        if int(batch_size) < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        self.batch_size = batch_size
        # Min-path tie-break mode. Default "fast" (the production mode,
        # ~2.9x cheaper kernel): cost-optimal paths whose only divergence
        # from the reference heap is the resolution order of exact cost
        # ties — worst-case 0.0424 px MAE on adversarial all-plateau
        # maps, 0.00033 px on realistic ridge maps, both inside the
        # 0.05 px parity budget (tests/test_minpath.py::
        # test_flagship_scale_fast_tie_parity_budget). Pass "exact" for
        # bit-parity with the reference heap (migration validation); the
        # low-level min_path_processing/ops APIs keep "exact" as their
        # default for the same reason.
        if minpath_tie_parity not in ("exact", "fast"):
            raise ValueError(
                f"minpath_tie_parity must be 'exact' or 'fast', got "
                f"{minpath_tie_parity!r}"
            )
        self.minpath_tie_parity = minpath_tie_parity
        # Conv-stack dtype on the optimized fast paths (s2d U-Net /
        # BN-folded DeepLabV3+); "bfloat16" halves conv HBM traffic at a
        # small near-tie argmax cost (tests/test_s2d_unet.py tolerance).
        if compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"compute_dtype must be 'float32' or 'bfloat16', got "
                f"{compute_dtype!r}"
            )
        self.compute_dtype = compute_dtype
        # Worker processes for the jax-free per-image artifact phase
        # (HDF5/CSV/PNG writes); 0/1 = serial in-process, "auto"
        # (default) = min(4, cpu_count - 1) (see `common/host_pool.py`).
        self.num_workers = host_pool.resolve_num_workers(num_workers)

        self.col_error_range = col_error_range
        # Heterogeneous-shape datasets (run_pipeline buckets by shape):
        # a DEFAULTED range is "full width" per image, while an explicit
        # range is clamped to each image's width in the per-image plots
        # — the dataset-wide range is derived from image 0 only
        # (reference `prediction_parameters.py:62-63`).
        self.col_error_range_explicit = col_error_range is not None
        if col_error_range is None:
            if len(dataset.images) == 0:
                raise ValueError(
                    "PredictionParams needs a non-empty dataset (or an "
                    "explicit col_error_range) to derive the error column "
                    "range"
                )
            self.col_error_range = range(dataset.images[0].shape[1])  # width
