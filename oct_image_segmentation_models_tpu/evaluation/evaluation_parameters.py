"""Evaluation configuration — reference
`evaluation/evaluation_parameters.py:12-85` (validation raises instead of
``sys.exit``)."""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

from ..common import EVALUATION_METRICS, host_pool, utils


class EvaluationSaveParams:
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


class EvaluationParameters:
    def __init__(
        self,
        model_path: Path,
        mlflow_tracking_uri: Optional[str],
        mlflow_run_uuid: Optional[str],
        test_dataset_path: Path,
        save_foldername: Path,
        save_params: EvaluationSaveParams,
        graph_search: bool,
        metrics: List[str],
        gsgrad=1,
        dice_errors: bool = True,
        binarize: bool = True,
        bg_ilm: bool = True,
        bg_csi: bool = False,
        batch_size: int = 8,
        num_workers="auto",
        minpath_tie_parity: str = "fast",
        compute_dtype: str = "float32",
    ):
        self.model_path = model_path
        self.mlflow_tracking_uri = mlflow_tracking_uri
        self.mlflow_run_uuid = mlflow_run_uuid
        self.test_dataset_path = Path(test_dataset_path)
        self.binarize = binarize
        self.save_params = save_params
        self.graph_search = graph_search
        if not set(metrics).issubset(EVALUATION_METRICS):
            raise ValueError(
                f"Some of the provided metrics are invalid. Provided "
                f"metrics: {metrics}."
            )
        self.metrics = metrics
        self.gsgrad = gsgrad
        self.dice_errors = dice_errors
        self.bg_ilm = bg_ilm
        self.bg_csi = bg_csi
        if int(batch_size) < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        self.batch_size = batch_size
        # Host-side per-image metric + artifact work (dice, surface
        # distances, HDF5/CSV/PNG writing) in a spawn process pool;
        # 0/1 = the serial reference-shaped loop. Device inference is
        # batched upfront either way. Scales with host cores (the
        # per-image phase is ~0.5-16 s/image at 512x1024, nearly all
        # matplotlib + scipy EDT); artifacts are bitwise-identical to
        # the serial path (tests/test_predict_evaluate.py). "auto"
        # (default) = min(4, cpu_count - 1): serial on small hosts,
        # parallel where it pays (common/host_pool.resolve_num_workers).
        self.num_workers = host_pool.resolve_num_workers(num_workers)
        # Default "fast": production min-path mode, inside the 0.05 px
        # parity budget (worst-case 0.0424 px, realistic 0.00033 px —
        # see prediction_parameters.py for the full rationale). Pass
        # "exact" for reference-heap bit parity.
        if minpath_tie_parity not in ("exact", "fast"):
            raise ValueError(
                f"minpath_tie_parity must be 'exact' or 'fast', got "
                f"{minpath_tie_parity!r}"
            )
        self.minpath_tie_parity = minpath_tie_parity
        # Conv-stack dtype on the optimized inference fast paths — lets a
        # bfloat16 deployment config be evaluated on real data.
        if compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"compute_dtype must be 'float32' or 'bfloat16', got "
                f"{compute_dtype!r}"
            )
        self.compute_dtype = compute_dtype
        self.save_foldername = Path(save_foldername)
        self.loaded_model, self.model_config = utils.load_model_and_config(
            model_path,
            mlflow_tracking_uri=mlflow_tracking_uri,
            mlflow_run_uuid=mlflow_run_uuid,
        )
        self.num_classes = self.loaded_model.output_classes
