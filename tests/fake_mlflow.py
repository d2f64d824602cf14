"""Minimal file-store ``mlflow`` stand-in for e2e tests.

The real package is not installable in this hermetic environment, so this
module faithfully emulates the API surface the framework uses
(``set_tracking_uri`` / ``set_experiment`` / ``start_run`` / ``log_*`` /
``get_run`` / ``artifacts.download_artifacts`` / ``artifacts.load_dict``)
on top of a local directory laid out like an mlflow file store
(``<root>/<experiment>/<run_id>/artifacts/...``). Tests inject it as
``sys.modules["mlflow"]`` before the framework's lazy ``import mlflow``.
"""

from __future__ import annotations

import json
import shutil
import types
import uuid
from pathlib import Path

_state = {
    "root": None,
    "experiment": "default",
    "run": None,
}


class _RunInfo:
    def __init__(self, run_id: str, artifact_uri: str):
        self.run_id = run_id
        self.artifact_uri = artifact_uri


class _Run:
    def __init__(self, run_id: str, artifact_dir: Path):
        self.info = _RunInfo(run_id, artifact_dir.as_uri())
        self.artifact_dir = artifact_dir


def set_tracking_uri(uri) -> None:
    uri = str(uri)
    if uri.startswith("file://"):
        uri = uri[len("file://"):]
    _state["root"] = Path(uri)


def get_tracking_uri() -> str:
    return str(_state["root"])


def set_experiment(name: str) -> None:
    _state["experiment"] = name


def start_run() -> _Run:
    run_id = uuid.uuid4().hex
    artifact_dir = (
        _state["root"] / _state["experiment"] / run_id / "artifacts"
    )
    artifact_dir.mkdir(parents=True)
    _state["run"] = _Run(run_id, artifact_dir)
    return _state["run"]


def end_run() -> None:
    _state["run"] = None


def get_run(run_id: str) -> _Run:
    root = _state["root"]
    for exp_dir in root.iterdir():
        candidate = exp_dir / run_id / "artifacts"
        if candidate.is_dir():
            return _Run(run_id, candidate)
    raise ValueError(f"Run '{run_id}' not found in {root}")


def _run_dir() -> Path:
    return _state["run"].artifact_dir.parent


def log_params(params: dict) -> None:
    if _state["run"] is None:  # real mlflow would auto-start; the
        return  # reference calls this even with tracking disabled
    out = _run_dir() / "params.json"
    merged = json.loads(out.read_text()) if out.exists() else {}
    merged.update({k: str(v) for k, v in params.items()})
    out.write_text(json.dumps(merged, indent=2))


def log_metrics(metrics: dict, step: int = 0) -> None:
    if _state["run"] is None:
        return
    with open(_run_dir() / "metrics.jsonl", "a") as fh:
        fh.write(json.dumps({"step": step, **metrics}, default=str) + "\n")


def log_dict(d: dict, artifact_path: str) -> None:
    if _state["run"] is None:
        return
    dest = _state["run"].artifact_dir / artifact_path
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_text(json.dumps(d, indent=2, default=str))


def log_artifact(local_path, artifact_path: str | None = None) -> None:
    if _state["run"] is None:
        return
    dest_dir = _state["run"].artifact_dir
    if artifact_path:
        dest_dir = dest_dir / artifact_path
    dest_dir.mkdir(parents=True, exist_ok=True)
    shutil.copy2(local_path, dest_dir / Path(local_path).name)


def _resolve(uri: str) -> Path:
    uri = str(uri)
    if uri.startswith("file://"):
        from urllib.request import url2pathname
        from urllib.parse import urlparse

        return Path(url2pathname(urlparse(uri).path))
    if uri.startswith("runs:/"):
        rest = uri[len("runs:/"):]
        run_id, _, artifact_path = rest.partition("/")
        return get_run(run_id).artifact_dir / artifact_path
    return Path(uri)


def _download_artifacts(artifact_uri: str) -> str:
    path = _resolve(artifact_uri)
    if not path.exists():
        raise FileNotFoundError(f"artifact not found: {artifact_uri}")
    return str(path)


def _load_dict(artifact_uri: str) -> dict:
    return json.loads(Path(_download_artifacts(artifact_uri)).read_text())


artifacts = types.SimpleNamespace(
    download_artifacts=_download_artifacts, load_dict=_load_dict
)


class MlflowException(Exception):
    """Mirror of ``mlflow.exceptions.MlflowException`` for the
    auth-failure exit path (``common/tracking.py get_tracker``)."""


exceptions = types.ModuleType("mlflow.exceptions")
exceptions.MlflowException = MlflowException
