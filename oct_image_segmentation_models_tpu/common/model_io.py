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

    def _s_attr(value: str) -> np.ndarray:
        # Size the fixed-width bytes dtype to the value: a fixed S10000
        # would SILENTLY truncate longer JSON (numpy str->S casts don't
        # raise), corrupting the checkpoint's embedded config.
        data = value.encode("utf-8")
        return np.array(data, dtype=f"S{max(len(data), 1)}")

    with h5py.File(path, "w") as f:
        f.attrs["model_name"] = _s_attr(model_name)
        f.attrs["model_config"] = _s_attr(json.dumps(model_config))
        f.attrs["format"] = _s_attr("octseg-tpu-v1")
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
        model_name = str(f.attrs["model_name"], "utf-8")
        model_config = json.loads(str(f.attrs["model_config"], "utf-8"))
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
        """Channels-last class probabilities for a (B, H, W, C) batch.

        ``batch_size`` chunks large inputs (one jit compilation per chunk
        shape; the final remainder chunk compiles separately)."""
        if batch_size is not None and batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {batch_size}")
        images = jnp.asarray(images)
        if batch_size is None or images.shape[0] <= batch_size:
            return np.asarray(self._apply(self.variables, images))
        chunks = [
            np.asarray(self._apply(self.variables, images[i : i + batch_size]))
            for i in range(0, images.shape[0], batch_size)
        ]
        return np.concatenate(chunks)


def _rebuild_container(model_name: str, model_config: dict):
    from ..models import get_model_class

    model_class = get_model_class(model_name)
    return model_class(**model_config)


def _is_native_checkpoint(path: Path) -> bool:
    with h5py.File(path, "r") as f:
        return f.attrs.get("format", b"") == b"octseg-tpu-v1"


def load_model_and_config(
    model_path,
    mlflow_tracking_uri=None,
    mlflow_run_uuid=None,
    **_kwargs,
) -> Tuple[LoadedModel, dict]:
    """Restore a model from a local checkpoint, a *reference Keras U-Net
    checkpoint* (imported weight-for-weight), or an MLflow artifact —
    reference `common/utils.py:26-70`.

    With ``mlflow_run_uuid``, ``model_path`` is interpreted relative to
    that run's artifact root (e.g. ``model/model_final.hdf5``, the path
    ``train_model`` logs it under) and the sidecar config is read from the
    run's ``model/data/model_config.json`` artifact — the reference's
    run-id load path (`common/utils.py:37-51`).
    """
    raw_model_path = str(model_path)  # Path() mangles s3://-style URIs
    model_path = Path(model_path)
    mlflow_config = None
    if mlflow_run_uuid and not mlflow_tracking_uri:
        # Without this, the run id would be silently dropped and
        # model_path misread as a local checkpoint path.
        raise ValueError(
            "mlflow_run_uuid requires mlflow_tracking_uri (the run can "
            "only be resolved against a tracking server/store)"
        )
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
        if mlflow_run_uuid:
            if model_path.is_absolute():
                # Joining an absolute path onto the artifact URI would
                # produce a malformed location and a confusing not-found
                # error from the artifact store.
                raise ValueError(
                    f"model_path must be relative to the run's artifact "
                    f"root when mlflow_run_uuid is set (e.g. "
                    f"'model/model_final.hdf5'), got absolute path "
                    f"{model_path}"
                )
            run = mlflow.get_run(mlflow_run_uuid)
            artifact_uri = run.info.artifact_uri.rstrip("/")
            local = mlflow.artifacts.download_artifacts(
                f"{artifact_uri}/{model_path.as_posix()}"
            )
            try:
                mlflow_config = mlflow.artifacts.load_dict(
                    f"{artifact_uri}/model/data/model_config.json"
                )
            except Exception:  # noqa: BLE001 — config falls back to embedded
                log.warning(
                    "Run %s has no model/data/model_config.json artifact; "
                    "using the checkpoint's embedded config",
                    mlflow_run_uuid,
                )
        else:
            # the ORIGINAL string: Path() collapses double slashes, so
            # str(model_path) would hand the store "s3:/bucket/..."
            local = mlflow.artifacts.download_artifacts(raw_model_path)
        model_path = Path(local)

    if _is_orbax_checkpoint(model_path):
        model_name, model_config, variables, _ = load_model_orbax(model_path)
    elif model_path.is_dir():
        raise ValueError(
            f"{model_path} is a directory but not an Orbax checkpoint "
            f"(missing {_ORBAX_META}); pass the checkpoint directory that "
            "save_model_orbax wrote, not a subdirectory"
        )
    elif not _is_native_checkpoint(model_path):
        # Keras checkpoints fetched by MLflow run id carry their config
        # as a run artifact, not a sidecar next to the download.
        return load_keras_model(model_path, model_config=mlflow_config)
    else:
        model_name, model_config, variables, _ = load_model(model_path)

    # Parity: prefer the run's logged config artifact, then the sidecar
    # model_config.json next to the checkpoint, then the embedded config.
    if mlflow_config is not None:
        model_config = mlflow_config
    else:
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


def load_keras_resnet50_weights(
    params: dict, h5_path: Path
) -> Tuple[dict, dict]:
    """Import ImageNet ResNet50 weights from a Keras ``.h5`` file into the
    Flax backbone (layer names match, see :mod:`..models.resnet`).

    Returns ``(params, batch_stats)``: a new params tree with conv
    kernels / BN scales-offsets replaced where names match, plus the
    matching ``batch_stats`` tree.
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


def _keras_layer_index(name: str, prefix: str) -> int:
    """conv2d -> 0, conv2d_3 -> 3 (Keras default layer naming)."""
    rest = name[len(prefix):]
    return int(rest[1:]) if rest else 0


def _keras_indexed_layers(root, prefix: str) -> list:
    """``prefix``, ``prefix_1``, ... layer names in creation order —
    the one scan both the importer and exporter index against."""
    return sorted(
        (n for n in root if n == prefix or n.startswith(prefix + "_")),
        key=lambda n: _keras_layer_index(n, prefix),
    )


# DeepLabV3+ head blocks in Keras creation order: entry i is the Flax
# param path that conv2d_i / batch_normalization_i map to — the six
# DSPP conv blocks (reference `models/deeplabv3plus.py:33-60`), then the
# three decoder conv blocks (`:98-118`). Shared by the Keras importer
# (`load_keras_deeplab_model`) and exporter (`_export_deeplab_layers`)
# so the round trip cannot desynchronize.
_DEEPLAB_HEAD_BLOCKS = tuple(
    [("DSPP_0", f"_ConvBlock_{i}") for i in range(6)]
    + [(f"_ConvBlock_{i}",) for i in range(3)]
)


def _keras_model_name(f: h5py.File, default: str) -> str:
    """Model name from the serialized Keras config attribute.

    The reference names its models after the registry key
    (`models/unet.py:149-153`, `models/deeplabv3plus.py:127-130`), so
    this is how checkpoints are dispatched to the right importer."""
    raw_cfg = f.attrs.get("model_config")
    if raw_cfg is None:
        return default
    try:
        cfg = json.loads(
            raw_cfg.decode() if isinstance(raw_cfg, bytes) else raw_cfg
        )
        return cfg.get("config", {}).get("name", default)
    except (ValueError, AttributeError):
        return default


def _keras_sidecar_config(model_path: Path, override: dict = None) -> dict:
    """Architecture hyper-parameters for a Keras checkpoint import: an
    explicit override (e.g. the MLflow run's logged config artifact) or
    the ``model_config.json`` the reference trainer writes next to the
    checkpoint (`training/training.py:50`)."""
    if override is not None:
        return override
    sidecar = Path(model_path).parent / "model_config.json"
    if not sidecar.exists():
        raise FileNotFoundError(
            f"Keras checkpoint import needs {sidecar} (written by the "
            "reference trainer) to rebuild the architecture"
        )
    with open(sidecar) as fh:
        return json.load(fh)


def _keras_weights_reader(root):
    """Layer-name -> {weight-name: np.ndarray} reader for a Keras h5
    weights group (descends the nested name/name/... groups Keras
    writes)."""

    def weights_of(layer):
        grp = root[layer]
        while layer in grp:
            grp = grp[layer]
        return {k.split(":")[0]: np.asarray(v) for k, v in grp.items()}

    return weights_of


def _init_flax_variables(module, model_config: dict):
    import jax as _jax

    return module.init(
        _jax.random.PRNGKey(0),
        np.zeros(
            (
                1,
                model_config["image_height"],
                model_config["image_width"],
                model_config["input_channels"],
            ),
            np.float32,
        ),
        training=False,
    )


def load_keras_model(
    model_path: Path, model_config: dict = None
) -> Tuple["LoadedModel", dict]:
    """Import a reference Keras checkpoint, dispatching on the embedded
    model name (U-Net by layer order, DeepLabV3+ by layer name).
    ``model_config`` overrides the sidecar lookup (MLflow-run loads)."""
    model_path = Path(model_path)
    with h5py.File(model_path, "r") as f:
        name = _keras_model_name(f, "unet")
    if name == "deeplabv3plus":
        return load_keras_deeplab_model(model_path, model_config=model_config)
    return load_keras_unet_model(
        model_path, model_name=name, model_config=model_config
    )


def load_keras_unet_model(
    model_path: Path, model_name: str = None, model_config: dict = None
) -> Tuple[LoadedModel, dict]:
    """Import a *reference* Keras U-Net checkpoint (the
    ``model_epoch{NN}.hdf5`` files Keras ModelCheckpoint writes, reference
    `training/training.py:319-326`) into the Flax U-Net.

    Keras assigns ``conv2d[_k]`` / ``batch_normalization[_k]`` names in
    layer-creation order, which matches the reference build order
    (`models/unet.py:106-147`) and this framework's ``ConvBlock_k``
    call order exactly, so weights map one-to-one by index. The
    architecture hyper-parameters come from the sidecar
    ``model_config.json`` the reference always writes next to the
    checkpoint (`training/training.py:50`).
    """
    import flax

    model_path = Path(model_path)
    model_config = _keras_sidecar_config(model_path, model_config)

    with h5py.File(model_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        if model_name is None:
            model_name = _keras_model_name(f, "unet")
        weights_of = _keras_weights_reader(root)

        convs = _keras_indexed_layers(root, "conv2d")
        bns = _keras_indexed_layers(root, "batch_normalization")
        conv_w = [weights_of(n) for n in convs]
        bn_w = [weights_of(n) for n in bns]

    container = _rebuild_container(model_name, model_config)
    module = container.build_model()
    variables = _init_flax_variables(module, model_config)
    params = flax.core.unfreeze(variables["params"])
    batch_stats = flax.core.unfreeze(variables.get("batch_stats", {}))

    blocks = sorted(
        (k for k in params if k.startswith("ConvBlock_")),
        key=lambda k: int(k.split("_")[1]),
    )
    if len(blocks) != len(bn_w) or len(convs) != len(blocks) + 1:
        raise ValueError(
            f"Keras checkpoint layout mismatch: {len(convs)} convs / "
            f"{len(bn_w)} batch-norms vs {len(blocks)} ConvBlocks"
        )

    for i, block in enumerate(blocks):
        kw, bw = conv_w[i], bn_w[i]
        tgt = params[block]["Conv_0"]
        if tuple(np.shape(tgt["kernel"])) != kw["kernel"].shape:
            raise ValueError(
                f"{block}: kernel shape {kw['kernel'].shape} != "
                f"{np.shape(tgt['kernel'])}"
            )
        tgt["kernel"] = jnp.asarray(kw["kernel"])
        tgt["bias"] = jnp.asarray(kw["bias"])
        bn_tgt = params[block]["BatchNorm_0"]
        bn_tgt["scale"] = jnp.asarray(bw["gamma"])
        bn_tgt["bias"] = jnp.asarray(bw["beta"])
        bs = batch_stats[block]["BatchNorm_0"]
        bs["mean"] = jnp.asarray(bw["moving_mean"])
        bs["var"] = jnp.asarray(bw["moving_variance"])

    head = params["Conv_0"]
    head["kernel"] = jnp.asarray(conv_w[-1]["kernel"])
    head["bias"] = jnp.asarray(conv_w[-1]["bias"])

    variables = {"params": params, "batch_stats": batch_stats}
    return LoadedModel(model_name, module, variables, model_config), model_config


def load_keras_deeplab_model(
    model_path: Path, model_config: dict = None
) -> Tuple[LoadedModel, dict]:
    """Import a *reference* Keras DeepLabV3+ checkpoint into Flax.

    The backbone convs/BNs carry Keras ResNet50 layer names (reference
    `models/deeplabv3plus.py:91` uses ``keras.applications.ResNet50``),
    which match the Flax backbone's layer names exactly
    (:mod:`..models.resnet`), so they map by name. The head layers get
    Keras default names (``conv2d[_k]`` / ``batch_normalization[_k]``)
    in creation order — DSPP pool/1x1/rate-6/12/18/projection blocks,
    the 48-filter low-level projection, two decoder blocks, then the
    softmax head (reference `models/deeplabv3plus.py:33-125`) — which
    matches this module's creation order, so they map by index.
    """
    import flax

    model_path = Path(model_path)
    model_config = _keras_sidecar_config(model_path, model_config)

    container = _rebuild_container("deeplabv3plus", model_config)
    module = container.build_model()
    variables = _init_flax_variables(module, model_config)
    params = flax.core.unfreeze(variables["params"])
    batch_stats = flax.core.unfreeze(variables.get("batch_stats", {}))

    with h5py.File(model_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        weights_of = _keras_weights_reader(root)

        # --- backbone, by Keras layer name ---
        for layer_name, target in params["resnet50"].items():
            if layer_name not in root:
                raise KeyError(
                    f"backbone layer {layer_name!r} missing from checkpoint"
                )
            src = weights_of(layer_name)
            if "kernel" in target:
                if tuple(target["kernel"].shape) != src["kernel"].shape:
                    raise ValueError(
                        f"{layer_name}: kernel {src['kernel'].shape} != "
                        f"{tuple(target['kernel'].shape)}"
                    )
                target["kernel"] = jnp.asarray(src["kernel"])
                if "bias" in target and "bias" in src:
                    target["bias"] = jnp.asarray(src["bias"])
            if "scale" in target:
                target["scale"] = jnp.asarray(src["gamma"])
                target["bias"] = jnp.asarray(src["beta"])
                bs = batch_stats["resnet50"][layer_name]
                bs["mean"] = jnp.asarray(src["moving_mean"])
                bs["var"] = jnp.asarray(src["moving_variance"])

        # --- head, by creation-order index ---
        convs = _keras_indexed_layers(root, "conv2d")
        bns = _keras_indexed_layers(root, "batch_normalization")
        head_blocks = _DEEPLAB_HEAD_BLOCKS
        if len(bns) != len(head_blocks) or len(convs) != len(head_blocks) + 1:
            raise ValueError(
                f"Keras DeepLab head layout mismatch: {len(convs)} convs / "
                f"{len(bns)} batch-norms vs {len(head_blocks)} blocks"
            )
        for i, path in enumerate(head_blocks):
            kw, bw = weights_of(convs[i]), weights_of(bns[i])
            p = params
            b = batch_stats
            for part in path:
                p = p[part]
                b = b[part]
            tgt = p["Conv_0"]
            if tuple(tgt["kernel"].shape) != kw["kernel"].shape:
                raise ValueError(
                    f"{'/'.join(path)}: kernel {kw['kernel'].shape} != "
                    f"{tuple(tgt['kernel'].shape)}"
                )
            tgt["kernel"] = jnp.asarray(kw["kernel"])
            if "bias" in tgt and "bias" in kw:
                tgt["bias"] = jnp.asarray(kw["bias"])
            bn_tgt = p["BatchNorm_0"]
            bn_tgt["scale"] = jnp.asarray(bw["gamma"])
            bn_tgt["bias"] = jnp.asarray(bw["beta"])
            bs = b["BatchNorm_0"]
            bs["mean"] = jnp.asarray(bw["moving_mean"])
            bs["var"] = jnp.asarray(bw["moving_variance"])

        head = params["Conv_0"]
        kw = weights_of(convs[-1])
        if tuple(head["kernel"].shape) != kw["kernel"].shape:
            raise ValueError(
                f"softmax head: kernel {kw['kernel'].shape} != "
                f"{tuple(head['kernel'].shape)} — num_classes mismatch "
                "between checkpoint and model_config.json?"
            )
        head["kernel"] = jnp.asarray(kw["kernel"])
        head["bias"] = jnp.asarray(kw["bias"])

    variables = {"params": params, "batch_stats": batch_stats}
    return (
        LoadedModel("deeplabv3plus", module, variables, model_config),
        model_config,
    )


# ---------------------------------------------------------------------------
# Keras weight EXPORT — the reverse migration path
# ---------------------------------------------------------------------------


def _keras_name(prefix: str, index: int) -> str:
    """Keras default layer naming: conv2d, conv2d_1, conv2d_2, ..."""
    return prefix if index == 0 else f"{prefix}_{index}"


def _write_keras_layer(root, layer_name: str, named_weights) -> None:
    """Write one layer in the Keras HDF5 weights layout: a group per
    layer with a ``weight_names`` attribute and the datasets nested as
    ``<layer>/<layer>/<weight>:0`` (the shape Keras ``save_weights``
    produces and both Keras's legacy h5 loader and
    :func:`_keras_weights_reader` consume)."""
    grp = root.create_group(layer_name)
    sub = grp.create_group(layer_name)
    weight_names = []
    for wname, arr in named_weights:
        sub.create_dataset(f"{wname}:0", data=np.asarray(arr, np.float32))
        weight_names.append(f"{layer_name}/{wname}:0".encode())
    size = max(len(n) for n in weight_names)
    grp.attrs["weight_names"] = np.array(weight_names, dtype=f"S{size}")


def _finalize_keras_export(f, layer_names) -> None:
    names = [n.encode() for n in layer_names]
    size = max(len(n) for n in names)
    f.attrs["layer_names"] = np.array(names, dtype=f"S{size}")
    f.attrs["backend"] = np.bytes_("tensorflow")
    # the reference pins TF/Keras 2.9 (`pyproject.toml:31`)
    f.attrs["keras_version"] = np.bytes_("2.9.0")


def _conv_weights(tree) -> list:
    out = [("kernel", tree["kernel"])]
    if "bias" in tree:
        out.append(("bias", tree["bias"]))
    return out


def _bn_weights(param_tree, stats_tree) -> list:
    return [
        ("gamma", param_tree["scale"]),
        ("beta", param_tree["bias"]),
        ("moving_mean", stats_tree["mean"]),
        ("moving_variance", stats_tree["var"]),
    ]


def _resnet50_pruned_layer_order() -> list:
    """Weighted-layer order of the reference's DeepLabV3+ backbone —
    ``keras.applications.ResNet50`` pruned at the ``conv4_block6_2_relu``
    tap (reference `models/deeplabv3plus.py:91-95`), in the functional
    graph's topological order (verified against a live build of the
    reference's own ``build_model()``; downsampling blocks interleave
    the shortcut as 1,1,2,2,0,3,0,3)."""
    order = ["conv1_conv", "conv1_bn"]
    for stage, n_blocks in ((2, 3), (3, 4), (4, 6)):
        for block in range(1, n_blocks + 1):
            pre = f"conv{stage}_block{block}"
            if stage == 4 and block == 6:  # pruned at the 2_relu tap
                order += [
                    f"{pre}_1_conv", f"{pre}_1_bn",
                    f"{pre}_2_conv", f"{pre}_2_bn",
                ]
            elif block == 1:
                order += [
                    f"{pre}_1_conv", f"{pre}_1_bn",
                    f"{pre}_2_conv", f"{pre}_2_bn",
                    f"{pre}_0_conv", f"{pre}_3_conv",
                    f"{pre}_0_bn", f"{pre}_3_bn",
                ]
            else:
                order += [
                    f"{pre}_1_conv", f"{pre}_1_bn",
                    f"{pre}_2_conv", f"{pre}_2_bn",
                    f"{pre}_3_conv", f"{pre}_3_bn",
                ]
    return order


# DeepLabV3+ head weighted-layer order in the reference model's graph:
# the five parallel DSPP branch convs are batched before their batch
# norms (verified against a live reference build). Entry i of
# _DEEPLAB_HEAD_BLOCKS maps conv2d_i / batch_normalization_i to the Flax
# param path (mirrors load_keras_deeplab_model's index mapping).
_DEEPLAB_HEAD_LAYER_ORDER = (
    ["conv2d", "batch_normalization"]
    + [f"conv2d_{i}" for i in range(1, 5)]
    + [f"batch_normalization_{i}" for i in range(1, 5)]
    + [
        name
        for i in range(5, 9)
        for name in (f"conv2d_{i}", f"batch_normalization_{i}")
    ]
    + ["conv2d_9"]
)


def save_keras_weights(
    path: Path,
    model_name: str,
    model_config: dict,
    variables: dict,
    write_sidecar: bool = True,
) -> Path:
    """Export Flax variables to a reference-consumable Keras weights h5.

    The reverse of :func:`load_keras_model` — lets a model trained here
    migrate BACK to the reference (Keras/TF) ecosystem: rebuild the
    architecture there with the reference's own ``build_model()`` and
    call ``model.load_weights(path)``. Layers are written in the
    reference model's weighted-layer order with Keras default names, so
    both order-based (``by_name=False``, the default) and fresh-session
    name-based loading work; :func:`load_keras_model` reads the file
    back too (round-trip tested against real Keras in
    ``tests/test_keras_export.py``).

    ``write_sidecar`` also writes ``model_config.json`` next to the
    checkpoint (the sidecar the reference trainer produces and this
    framework's Keras importer requires). Returns the written path.

    Caveat: order-based ``load_weights`` relies on Keras's functional
    topological layer order, verified against Keras 3; the reference's
    pinned Keras 2.9 uses the same graph-construction order for these
    architectures, but name-based loading (fresh session) is the
    belt-and-braces path.
    """
    path = Path(path)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    with h5py.File(path, "w") as f:
        if model_name == "deeplabv3plus":
            layer_names = _export_deeplab_layers(f, params, batch_stats)
        elif model_name == "unet":
            layer_names = _export_unet_layers(f, params, batch_stats)
        else:
            raise ValueError(
                f"save_keras_weights supports 'unet' and 'deeplabv3plus', "
                f"got {model_name!r}"
            )
        _finalize_keras_export(f, layer_names)
        # minimal Keras-style model_config attribute: carries the model
        # name load_keras_model dispatches on (Keras's own load_weights
        # never reads it)
        f.attrs["model_config"] = np.bytes_(
            json.dumps(
                {"class_name": "Functional", "config": {"name": model_name}}
            )
        )

    if write_sidecar:
        with open(path.parent / "model_config.json", "w") as fh:
            json.dump(model_config, fh)
    return path


def _export_unet_layers(f, params, batch_stats) -> list:
    """U-Net: ConvBlock_i -> conv2d_i + batch_normalization_i (creation
    order, reference `models/unet.py:106-147`), softmax head last."""
    blocks = sorted(
        (k for k in params if k.startswith("ConvBlock_")),
        key=lambda k: int(k.split("_")[1]),
    )
    layer_names = []
    for i, block in enumerate(blocks):
        conv_name = _keras_name("conv2d", i)
        bn_name = _keras_name("batch_normalization", i)
        _write_keras_layer(f, conv_name, _conv_weights(params[block]["Conv_0"]))
        _write_keras_layer(
            f,
            bn_name,
            _bn_weights(
                params[block]["BatchNorm_0"],
                batch_stats[block]["BatchNorm_0"],
            ),
        )
        layer_names += [conv_name, bn_name]
    head_name = _keras_name("conv2d", len(blocks))
    _write_keras_layer(f, head_name, _conv_weights(params["Conv_0"]))
    layer_names.append(head_name)
    return layer_names


def _export_deeplab_layers(f, params, batch_stats) -> list:
    """DeepLabV3+: Keras-named backbone by name, head by index (the
    inverse of :func:`load_keras_deeplab_model`'s mapping)."""
    backbone_order = _resnet50_pruned_layer_order()
    missing = set(backbone_order) - set(params["resnet50"])
    extra = set(params["resnet50"]) - set(backbone_order)
    if missing or extra:
        raise ValueError(
            f"backbone layer set mismatch: missing {sorted(missing)}, "
            f"unexpected {sorted(extra)}"
        )
    for name in backbone_order:
        tree = params["resnet50"][name]
        if "kernel" in tree:
            _write_keras_layer(f, name, _conv_weights(tree))
        else:
            _write_keras_layer(
                f, name, _bn_weights(tree, batch_stats["resnet50"][name])
            )

    for i, block_path in enumerate(_DEEPLAB_HEAD_BLOCKS):
        p, b = params, batch_stats
        for part in block_path:
            p = p[part]
            b = b[part]
        _write_keras_layer(
            f, _keras_name("conv2d", i), _conv_weights(p["Conv_0"])
        )
        _write_keras_layer(
            f,
            _keras_name("batch_normalization", i),
            _bn_weights(p["BatchNorm_0"], b["BatchNorm_0"]),
        )
    _write_keras_layer(f, "conv2d_9", _conv_weights(params["Conv_0"]))
    return backbone_order + _DEEPLAB_HEAD_LAYER_ORDER


# ---------------------------------------------------------------------------
# Orbax checkpoint backend (optional alternative to the HDF5 format)
# ---------------------------------------------------------------------------

_ORBAX_META = "octseg_model.json"


def save_model_orbax(path: Path, model_name: str, model_config: dict, variables: dict):
    """Write an Orbax directory checkpoint (async-safe, multi-host aware)
    with the model name/config alongside so it stays self-contained like
    the HDF5 format."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    # Overwrite-capable like the HDF5 writer (h5py "w"): the trainer
    # re-saves the best-on-monitor checkpoint at finalization with
    # precise BN statistics (training.py), and Orbax refuses to save
    # over an existing directory without force.
    ckptr.save(path / "variables", variables, force=True)
    with open(path / _ORBAX_META, "w") as fh:
        json.dump({"model_name": model_name, "model_config": model_config}, fh)


def load_model_orbax(path: Path) -> Tuple[str, dict, dict, None]:
    """Inverse of :func:`save_model_orbax`; same return signature as
    :func:`load_model`."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with open(path / _ORBAX_META) as fh:
        meta = json.load(fh)
    ckptr = ocp.PyTreeCheckpointer()
    variables = ckptr.restore(path / "variables")
    return meta["model_name"], meta["model_config"], variables, None


def _is_orbax_checkpoint(path: Path) -> bool:
    return Path(path).is_dir() and (Path(path) / _ORBAX_META).exists()


def load_checkpoint(path: Path) -> Tuple[str, dict, dict, Optional[bytes]]:
    """Format-dispatching restore (HDF5 or Orbax) — used by the trainer's
    ``initial_model`` resume path."""
    if _is_orbax_checkpoint(path):
        return load_model_orbax(path)
    return load_model(path)
