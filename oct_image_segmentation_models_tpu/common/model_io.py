"""Model checkpoint I/O: self-contained HDF5 checkpoints + loader.

Keeps the reference's checkpoint ergonomics — a single
``model_epoch{NN}.hdf5`` file per save (reference `training/training.py:319-326`)
with ``model_config.json`` alongside — while storing Flax parameter /
batch-stats pytrees as HDF5 datasets keyed by their tree paths. The model
name and config are embedded as attributes, so a checkpoint alone is
sufficient to rebuild and run the model (the sidecar ``model_config.json``
is still written and read for parity with reference
`common/utils.py:63-70`).

Also provides ``load_model_and_config`` (reference `common/utils.py:26-70`)
returning a :class:`LoadedModel` whose ``.predict`` mirrors
``keras.Model.predict`` (channels-last probabilities), jitted and cached
per input shape, and a by-name Keras ResNet50 weight importer for the
DeepLabV3+ backbone.
"""

from __future__ import annotations

import json
import logging as log
from pathlib import Path
from typing import Optional, Tuple

import h5py
import jax
import jax.numpy as jnp
import numpy as np


def _flatten_tree(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_tree(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_model(
    path: Path,
    model_name: str,
    model_config: dict,
    variables: dict,
    opt_state_bytes: Optional[bytes] = None,
):
    """Write a self-contained HDF5 checkpoint."""
    path = Path(path)
    with h5py.File(path, "w") as f:
        f.attrs["model_name"] = np.array(model_name, dtype="S100")
        f.attrs["model_config"] = np.array(json.dumps(model_config), dtype="S10000")
        f.attrs["format"] = np.array("octseg-tpu-v1", dtype="S100")
        for collection, tree in variables.items():
            grp = f.create_group(collection)
            for key, value in _flatten_tree(tree).items():
                grp.create_dataset(key, data=value)
        if opt_state_bytes is not None:
            f.create_dataset(
                "opt_state", data=np.frombuffer(opt_state_bytes, dtype=np.uint8)
            )


def load_model(path: Path) -> Tuple[str, dict, dict, Optional[bytes]]:
    """Read a checkpoint -> (model_name, model_config, variables, opt_state)."""
    path = Path(path)
    with h5py.File(path, "r") as f:
        model_name = str(f.attrs["model_name"], "ascii")
        model_config = json.loads(str(f.attrs["model_config"], "ascii"))
        variables = {}
        for collection in f:
            if collection == "opt_state":
                continue
            flat = {}

            def visit(key, obj, _flat=flat):
                if isinstance(obj, h5py.Dataset):
                    _flat[key] = jnp.asarray(obj[()])

            f[collection].visititems(visit)
            variables[collection] = _unflatten(flat)
        opt_state = (
            bytes(f["opt_state"][()].tobytes()) if "opt_state" in f else None
        )
    return model_name, model_config, variables, opt_state


class LoadedModel:
    """A restored model with keras-like ``predict``.

    ``.name`` mirrors ``keras.Model.name`` (the registry key, reference
    `prediction/prediction.py:61`); ``.output_classes`` mirrors
    ``model.output.shape[-1]`` (reference
    `prediction/prediction_parameters.py:53`).
    """

    def __init__(self, name: str, module, variables: dict, model_config: dict):
        self.name = name
        self.module = module
        self.variables = variables
        self.model_config = model_config
        self.output_classes = model_config["num_classes"]
        self._apply = jax.jit(
            lambda v, x: self.module.apply(v, x, training=False)
        )

    def predict(self, images, batch_size: Optional[int] = None, verbose=0):
        """Channels-last class probabilities for a (B, H, W, C) batch."""
        images = jnp.asarray(images)
        return np.asarray(self._apply(self.variables, images))


def _rebuild_container(model_name: str, model_config: dict):
    from ..models import get_model_class

    model_class = get_model_class(model_name)
    return model_class(**model_config)


def load_model_and_config(
    model_path,
    mlflow_tracking_uri=None,
    mlflow_run_uuid=None,
    **_kwargs,
) -> Tuple[LoadedModel, dict]:
    """Restore a model from a local checkpoint or an MLflow artifact —
    reference `common/utils.py:26-70`."""
    model_path = Path(model_path)
    if mlflow_tracking_uri:
        try:
            import mlflow
        except ImportError as exc:
            raise RuntimeError(
                "mlflow_tracking_uri was provided but mlflow is not "
                "installed; install the 'tracking' extra or pass a local "
                "checkpoint path"
            ) from exc
        mlflow.set_tracking_uri(mlflow_tracking_uri)
        local = mlflow.artifacts.download_artifacts(str(model_path))
        model_path = Path(local)

    model_name, model_config, variables, _ = load_model(model_path)

    # Parity: prefer the sidecar model_config.json when present.
    sidecar = model_path.parent / "model_config.json"
    if sidecar.exists():
        try:
            with open(sidecar) as fh:
                model_config = json.load(fh)
        except (OSError, json.JSONDecodeError):
            log.warning("Could not read %s; using embedded config", sidecar)

    container = _rebuild_container(model_name, model_config)
    module = container.build_model()
    return LoadedModel(model_name, module, variables, model_config), model_config


def load_keras_resnet50_weights(params: dict, h5_path: Path) -> dict:
    """Import ImageNet ResNet50 weights from a Keras ``.h5`` file into the
    Flax backbone (layer names match, see :mod:`..models.resnet`).

    Returns a new params tree with conv kernels / BN scales-offsets (and a
    ``batch_stats`` tree) replaced where names match.
    """
    import flax

    params = flax.core.unfreeze(params)
    batch_stats = {}
    with h5py.File(h5_path, "r") as f:
        weight_root = f["model_weights"] if "model_weights" in f else f

        def get_layer(name):
            if name in weight_root and name in weight_root[name]:
                return weight_root[name][name]
            return weight_root.get(name)

        for layer_name, target in params.items():
            src = get_layer(layer_name)
            if src is None:
                continue
            if "kernel" in target and "kernel:0" in src:
                target["kernel"] = jnp.asarray(src["kernel:0"][()])
                if "bias" in target and "bias:0" in src:
                    target["bias"] = jnp.asarray(src["bias:0"][()])
            if "scale" in target and "gamma:0" in src:
                target["scale"] = jnp.asarray(src["gamma:0"][()])
                target["bias"] = jnp.asarray(src["beta:0"][()])
                batch_stats[layer_name] = {
                    "mean": jnp.asarray(src["moving_mean:0"][()]),
                    "var": jnp.asarray(src["moving_variance:0"][()]),
                }
    return params, batch_stats
