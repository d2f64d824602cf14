"""Training driver — reference `training/training.py:135-408`, TPU-native.

Differences in the compute path (everything else — config surface, run
artifacts, checkpoint naming, epoch stats, early stopping — mirrors the
reference):

- the model is a Flax module; the train step is jitted once per input
  shape and sharded over a 1-D device mesh with ``shard_map`` + ``pmean``
  gradients (replacing ``tf.distribute.MirroredStrategy``,
  reference `:185-188`);
- checkpoints are self-contained HDF5 files (``model_epoch{NN}.hdf5``,
  same naming as reference `:319-326`) written by
  :mod:`..common.model_io`;
- ``initial_model`` resume works (the reference's resume calls a
  nonexistent ``utils.load_model``, `:239`);
- the computed class weights are actually passed to weighted losses
  (the reference computes them but never forwards them to the loss
  factory, `:200-216`);
- MLflow is optional: without it, params/metrics land in local JSON files
  (see :mod:`..common.tracking`).
"""

from __future__ import annotations

import contextlib
import functools
import json
import logging as log
import math
import os
import re
import types
from pathlib import Path
from typing import Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from ..common import custom_losses, custom_metrics
from ..common import data_generator as data_gen
from ..common import dataset_loader, utils
from ..common import profiling
from ..common import model_io
from ..common.mlflow_parameters import MLflowParameters
from ..common.tracking import (
    NullTracker,
    get_tensorboard_writer,
    get_tracker,
)
from ..models import get_model_class
from ..parallel.input_pipeline import prefetch_to_mesh
from ..parallel.mesh import create_mesh
from ..parallel.train_step import (
    KERAS_OPTIMIZER_NAMES,
    build_optimizer,
    create_train_state,
    make_eval_step,
    make_train_step,
    resolved_optimizer_config,
)
from . import training_callbacks
from .training_parameters import TrainingParams

TRAIN_STATE_FILENAME = "train_state_latest.npz"


def _split_meta_arrays(obj, out: dict):
    """Replace ndarray values inside ``meta`` with npz-key markers.

    Generator sampling states carry the full ``sample_shuffle``
    permutation — dataset-sized int arrays that would otherwise be
    JSON-encoded as Python lists on every epoch's checkpoint. They are
    stored as compact npz arrays instead (keys ``metaarr_<n>``)."""
    if isinstance(obj, np.ndarray):
        key = f"metaarr_{len(out)}"
        out[key] = obj
        return {"__meta_array__": key}
    if isinstance(obj, dict):
        return {k: _split_meta_arrays(v, out) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_split_meta_arrays(v, out) for v in obj]
    return obj


def _join_meta_arrays(obj, data):
    if isinstance(obj, dict):
        if set(obj) == {"__meta_array__"}:
            return np.asarray(data[obj["__meta_array__"]])
        return {k: _join_meta_arrays(v, data) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_join_meta_arrays(v, data) for v in obj]
    return obj


def save_train_state(path: Path, tree, meta: dict) -> None:
    """Rolling full-train-state checkpoint for exact resume.

    ``tree`` is the host pytree ``{"state": TrainState, "best":
    best_variables}``; ``meta`` carries epoch, the host RNG key, the
    best-monitor bookkeeping, and the model name/config needed to
    rebuild an identical step function. Written atomically (tmp +
    rename) so a preemption mid-write can't corrupt the previous
    checkpoint. The reference has no preemption story at all
    (SURVEY.md §5: no failure detection/elastic recovery).
    """
    leaves, _ = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = _split_meta_arrays(meta, arrays)
    tmp = Path(str(path) + ".tmp")
    with open(tmp, "wb") as fh:
        np.savez(fh, __meta__=np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        ), **arrays)
    os.replace(tmp, path)


def load_train_state(path: Path):
    """Returns (meta dict, leaf list) saved by :func:`save_train_state`."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        meta = _join_meta_arrays(meta, data)
        n = sum(1 for k in data.files if k.startswith("leaf_"))
        leaves = [data[f"leaf_{i}"] for i in range(n)]
    return meta, leaves


def _resume_run_config(
    training_params: TrainingParams, dataset_md5: str
) -> dict:
    """The hyperparameters that determine the training trajectory.

    Saved into the train-state meta and compared on resume: a silent
    mismatch (different learning rate, loss, seed, dataset, ...) would
    break the documented bitwise-identical-resume guarantee while the
    flattened state arrays still line up. ``dataset_md5`` identifies
    the training data — the restored generator sampling state
    (``sample_shuffle`` permutation, counters) is only meaningful
    against the exact dataset it was drawn from.
    """
    cfg = {
        # opt_con may be a name, an optax factory, a functools.partial,
        # or a ready GradientTransformation (a NamedTuple of closures) —
        # all projected address-stably by _stable_json below. A bare
        # getattr(__name__)/str() here would embed memory addresses for
        # the transformation case and reject every legitimate resume.
        "optimizer": training_params.opt_con,
        "opt_params": training_params.opt_params,
        "loss": training_params.loss,
        "loss_fn_kwargs": training_params.loss_fn_kwargs,
        "metric": training_params.metric,
        "batch_size": training_params.batch_size,
        "seed": training_params.seed,
        "class_weight": training_params.class_weight,
        "augmentations": training_params.augmentations,
        "aug_mode": training_params.aug_mode,
        "aug_probs": list(training_params.aug_probs),
        "aug_fly": training_params.aug_fly,
        "aug_val": training_params.aug_val,
        "shuffle": training_params.shuffle,
        "channels_last": training_params.channels_last,
        "train_step_impl": training_params.train_step_impl,
        "train_forward_impl": training_params.train_forward_impl,
        "aug_device": training_params.aug_device,
        # model_hyperparameters can override non-structural config knobs
        # (dtype, pretrained_weights) at rebuild, changing the numeric
        # trajectory — so they are part of the resume identity.
        "model_hyperparameters": training_params.model_hyperparameters,
        # best_monitor/best_variables are restored on resume; comparing
        # them against a different monitored quantity (or direction)
        # silently corrupts best-checkpoint selection.
        "model_save_monitor": list(training_params.model_save_monitor),
        # val metrics (hence the restored best_monitor / best_es values)
        # were computed under one statistics semantics; resuming under
        # the other silently mixes the two selection signals.
        "bn_precise_val": training_params.bn_precise_val,
        "training_dataset_md5": dataset_md5,
    }

    return _stable_json(cfg)


def _stable_json(value):
    """Normalize to JSON-comparable values (tuples vs lists, numpy
    scalars). Callables project to qualified name PLUS their bound data
    (partial args/keywords, closure cells, defaults): ``str()`` would
    embed the memory address, which never matches across processes,
    while a bare qualname would collapse e.g. two learning-rate
    schedules from the same factory with different rates — silently
    passing the resume mismatch check with a different trajectory."""

    def _object_state(v):
        """Project a stateful object to its type plus instance
        attributes; with no introspectable state, stay fail-closed with
        a process-unique marker (two distinct opaque objects must never
        compare equal — the fix is plain data in the config)."""
        state = dict(getattr(v, "__dict__", None) or {})
        for slot in getattr(type(v), "__slots__", ()) or ():
            if hasattr(v, slot):
                state[slot] = getattr(v, slot)
        if state:
            try:
                return {
                    "type": type(v).__qualname__,
                    "state": {k: _coerce(x) for k, x in sorted(state.items())},
                }
            except (TypeError, ValueError):
                # unserializable / circular attribute graph
                pass
        return {"type": type(v).__qualname__, "opaque": id(v)}

    def _project(v):
        if isinstance(v, functools.partial):
            return {
                "partial": _project(v.func),
                "args": [_coerce(a) for a in v.args],
                "keywords": {k: _coerce(a) for k, a in sorted(v.keywords.items())},
            }
        if isinstance(v, types.MethodType):
            # a bound method's state lives on its receiver
            return {
                "method": _project(v.__func__),
                "self": _object_state(v.__self__),
            }
        if not isinstance(
            v, (types.FunctionType, types.BuiltinFunctionType)
        ):
            # A callable INSTANCE (a class with __call__) carries its
            # call-site state in instance attributes, not closure
            # cells — a bare class-name projection would collapse e.g.
            # Sched(1e-3) and Sched(1e-4), failing open.
            state = _object_state(v)
            if "opaque" in state and hasattr(v, "__name__"):
                # a NAMED stateless C callable (e.g. a numpy ufunc) is a
                # module-level singleton — bare name, like any factory
                return getattr(v, "__qualname__", v.__name__)
            return state
        name = getattr(v, "__qualname__", getattr(v, "__name__", type(v).__name__))
        cells = getattr(v, "__closure__", None) or ()
        if not cells and "<locals>" not in str(name):
            # A MODULE-LEVEL factory carries no call-site state: its
            # bound data arrives via opt_params / partial keywords
            # (checked separately) and its ``__defaults__`` are
            # library-version noise — embedding them would falsely
            # reject resume after e.g. an optax upgrade that appends a
            # behavior-preserving keyword. The bare name also matches
            # run configs written by older framework versions, which
            # stored just ``__name__``. Nested functions ("<locals>" in
            # the qualname) are call-site-created, so their defaults ARE
            # state and fall through to the full projection.
            return name
        closure = []
        for cell in cells:
            try:
                closure.append(_coerce(cell.cell_contents))
            except ValueError:  # empty cell
                closure.append("<empty cell>")
        defaults = [_coerce(d) for d in (getattr(v, "__defaults__", None) or ())]
        out = {"fn": name, "closure": closure, "defaults": defaults}
        kwdefaults = getattr(v, "__kwdefaults__", None)
        if kwdefaults:
            # only when present, so projections of ordinary closures stay
            # byte-identical to configs saved by earlier versions
            out["kwdefaults"] = {
                k: _coerce(x) for k, x in sorted(kwdefaults.items())
            }
        return out

    def _coerce(v):
        # round-trip nested values through the same projection
        return json.loads(json.dumps(v, default=_default))

    def _default(v):
        if callable(v):
            return _project(v)
        # Reprs may embed per-process memory addresses ("<Foo object at
        # 0x7f...>"), which never match across processes. Scrub ONLY the
        # address pattern (a bare "0x[hex]" scrub would also collapse
        # legitimate hex-literal state like "flags=0x10" vs "0x20").
        text = re.sub(r"\bat 0x[0-9a-fA-F]+", "at 0x", str(v))
        # qualnames of nested classes contain "<locals>", so match any
        # "<... object at 0x>" default-repr shape, not just dotted names
        if re.fullmatch(r"<.+ object at 0x>", text):
            # A default repr carries no state at all: after the scrub,
            # two DIFFERENT values would compare equal (fail-open,
            # silently voiding the bitwise-identical-resume guarantee).
            # Project the instance attributes instead.
            return _object_state(v)
        return text

    return _coerce(value)


_NON_STRUCTURAL_CONFIG_KEYS = frozenset({"dtype", "pretrained_weights"})


def _check_hyperparameter_conflicts(
    model_config: dict, hyperparameters: dict, context: str
) -> None:
    """Reject ``model_hyperparameters`` that contradict a loaded model.

    When training continues from a checkpoint (``resume_train_state`` /
    ``initial_model``), the architecture comes from the saved
    ``model_config``; ``model_hyperparameters`` may only restate saved
    values or change NON-structural knobs: ``dtype`` is a compute dtype
    (the checkpoint's weights are dtype-convertible — e.g. fine-tuning a
    float32 model in bfloat16) and ``pretrained_weights`` only seeds
    from-scratch initialisation, so both are safe to override. Overriding
    a structural key (e.g. ``start_neurons``) would rebuild a module the
    checkpoint's weights don't describe — a shape error at best, silent
    corruption at worst.
    """
    conflicts = {
        k: (model_config[k], v)
        for k, v in hyperparameters.items()
        if k in model_config
        and k not in _NON_STRUCTURAL_CONFIG_KEYS
        and _stable_json(model_config[k]) != _stable_json(v)
    }
    if conflicts:
        raise ValueError(
            f"model_hyperparameters conflict with the {context} model's "
            f"saved architecture on {sorted(conflicts)} "
            f"(saved={ {k: s for k, (s, _) in conflicts.items()} }, "
            f"requested={ {k: r for k, (_, r) in conflicts.items()} }); "
            "continued training must keep the architecture the checkpoint "
            "was built with — only extension knobs absent from the saved "
            "config (e.g. dtype) may be set"
        )


def save_training_params_file(
    save_foldername: Path,
    model_summary: str,
    model_config: dict,
    training_dataset_md5: str,
    class_weight,
    timestamp,
    train_params: TrainingParams,
    opt_config: dict,
):
    """Self-describing run snapshot — reference `training/training.py:40-132`
    (same filenames and attribute keys)."""
    with open(save_foldername / "model_config.json", "w") as config_file:
        json.dump(model_config, config_file)

    with h5py.File(save_foldername / "training_params.hdf5", "w") as f:
        f.attrs["timestamp"] = np.array(timestamp, dtype="S100")
        f.attrs["model_summary"] = np.array(model_summary, dtype="S1000")
        f.attrs["train_dataset_md5"] = np.array(training_dataset_md5, dtype="S1000")
        f.attrs["epochs"] = train_params.epochs
        f.attrs["loss_name"] = np.array(train_params.loss, dtype="S1000")
        f.attrs["metric_name"] = np.array(train_params.metric, dtype="S1000")
        if class_weight is None:
            f.attrs["class_weight"] = np.array("None", dtype="S1000")
        else:
            f.attrs["class_weight"] = np.array("array", dtype="S1000")
            f["class_weight"] = np.asarray(class_weight)
        f.attrs["metric"] = np.array(train_params.metric, dtype="S100")
        f.attrs["loss"] = np.array(train_params.loss, dtype="S100")
        f.attrs["batch_size"] = train_params.batch_size
        f.attrs["shuffle"] = train_params.shuffle
        f.attrs["aug_mode"] = np.array(train_params.aug_mode, dtype="S100")

        if train_params.aug_mode != "none":
            for aug_ind, (aug_fn, aug_arg) in enumerate(train_params.aug_fn_args):
                desc = aug_fn(None, None, aug_arg, True)
                if not isinstance(aug_arg, dict):
                    f.attrs[f"aug_{aug_ind + 1}"] = np.array(desc, dtype="S1000")
                else:
                    f.attrs[f"aug_{aug_ind + 1}"] = np.array(
                        aug_fn.__name__, dtype="S100"
                    )
                    for key, val in aug_arg.items():
                        attr = f"aug_{aug_ind + 1}_param: {key}"
                        if isinstance(val, (int, float)):
                            f.attrs[attr] = np.array(val)
                        elif isinstance(val, str):
                            # unbounded bytes — a fixed S-width silently
                            # truncates user-supplied values
                            f.attrs[attr] = np.bytes_(val)
                        elif isinstance(val, list):
                            f.attrs[attr] = np.bytes_(str(val))
            if train_params.aug_mode == "one":
                f.attrs["aug_probs"] = np.array(train_params.aug_probs)
        # Written for every aug_mode, incl. "none" (reference
        # `training/training.py:117-118` dedents these to function level).
        f.attrs["aug_fly"] = train_params.aug_fly
        f.attrs["aug_val"] = train_params.aug_val

        opt_con = train_params.opt_con
        if isinstance(opt_con, str):
            # the reference records the Keras class __name__
            # (`training/training.py:120-122`): "Adam", not "adam" —
            # same table resolved_optimizer_config uses for cfg["name"]
            opt_name = KERAS_OPTIMIZER_NAMES.get(opt_con.lower(), opt_con)
        else:
            # name, not repr: a GradientTransformation's repr embeds
            # per-process memory addresses (and would truncate at a
            # fixed S-width)
            opt_name = getattr(
                opt_con, "__name__", type(opt_con).__qualname__
            )
        # Framework-only provenance attrs (absent from the reference's
        # writer): record whether the saved checkpoints' batch_stats are
        # precise-BN population statistics rather than Keras rolling
        # statistics, and whether epoch val metrics used the precise-BN
        # refresh — downstream parity comparisons must know which
        # semantics a run used (ADVICE r4).
        f.attrs["bn_precise_stats"] = bool(train_params.bn_precise_stats)
        f.attrs["bn_precise_val"] = bool(train_params.bn_precise_val)
        f.attrs["optimizer"] = np.bytes_(opt_name)
        for key, val in opt_config.items():
            if val is None:
                continue
            if isinstance(val, (bool, int, float, np.integer, np.floating)):
                f.attrs[f"opt_param: {key}"] = val
            elif isinstance(val, str):
                # plain assignment (h5py variable-length unicode) —
                # exactly what the reference's writer stores
                # (`training/training.py:128-130`)
                f.attrs[f"opt_param: {key}"] = val
            elif callable(val):
                # e.g. a learning-rate schedule: record its name, not a
                # repr that embeds a per-process memory address
                f.attrs[f"opt_param: {key}"] = np.bytes_(
                    getattr(val, "__qualname__", type(val).__qualname__)
                )
            else:  # dicts / lists / arbitrary config values
                f.attrs[f"opt_param: {key}"] = np.bytes_(str(val))


def _monitor_improved(current, best, mode):
    if best is None:
        return True
    return current > best if mode == "max" else current < best


def train_model(
    training_params: TrainingParams,
    mlflow_params: Optional[MLflowParameters] = None,
) -> Path:
    """Train a model; returns the run's save folder.

    Call stack parity with reference `training/training.py:135-408`.
    """
    proc_count, proc_index = jax.process_count(), jax.process_index()
    is_main_process = proc_index == 0
    # Tracking (incl. MLflow network calls) is a process-0 concern only.
    tracker = get_tracker(mlflow_params) if is_main_process else NullTracker()

    training_dataset_path = training_params.training_dataset_path
    with h5py.File(training_dataset_path, "r") as hdf5_file:
        train_images, train_labels = dataset_loader.load_training_data(hdf5_file)
        val_images, val_labels = dataset_loader.load_validation_data(hdf5_file)

    num_classes = int(len(np.unique(train_labels)))
    log.info(f"Detected {num_classes} classes")

    # Balanced class weights use the FULL label set (before any
    # multi-host sharding) so every process bakes the same weights into
    # its loss.
    if training_params.class_weight == "balanced":
        dataset_labels = np.concatenate((train_labels, val_labels))
        c_weight = custom_losses.compute_balanced_class_weight(dataset_labels)
    elif isinstance(training_params.class_weight, list):
        c_weight = np.array(training_params.class_weight)
    else:
        c_weight = None

    # Multi-host: each process keeps its strided sample shard (same
    # layout as parallel.input_pipeline.ShardedHDF5Reader) and assembles
    # global batches via make_array_from_process_local_data in
    # shard_batch. num_classes and class weights above were computed from
    # the full label set so all processes agree.
    if proc_count > 1:
        if training_params.batch_size % proc_count:
            raise ValueError(
                f"batch_size ({training_params.batch_size}) must be "
                f"divisible by the process count ({proc_count})"
            )
        shard = slice(proc_index, None, proc_count)
        # Trim every shard to the smallest shard size so all processes
        # run the same number of steps (unequal step counts would
        # deadlock the collectives).
        n_tr = len(train_images) // proc_count
        n_va = len(val_images) // proc_count
        train_images = train_images[shard][:n_tr]
        train_labels = train_labels[shard][:n_tr]
        val_images = val_images[shard][:n_va]
        val_labels = val_labels[shard][:n_va]
        log.info(
            f"Process {proc_index}/{proc_count}: "
            f"{len(train_images)} train / {len(val_images)} val samples"
        )

    _, image_height, image_width, input_channels = train_images.shape
    log.info(
        f"Detected input image dimensions (h x w): {image_height} x {image_width}."
    )
    log.info(f"Detected {input_channels} input channels.")

    # Device mesh: all chips whose count divides the batch evenly
    # (multi-host must use every device — all processes participate).
    devices = jax.devices()
    if proc_count > 1:
        if training_params.batch_size % len(devices):
            raise ValueError(
                f"batch_size ({training_params.batch_size}) must be "
                f"divisible by the global device count ({len(devices)}) "
                "for multi-host training"
            )
        usable = len(devices)
    else:
        usable = math.gcd(training_params.batch_size, len(devices))
        if usable < len(devices):
            # gcd(7, 8) = 1: a batch size coprime with the device count
            # silently trains on one chip at 1/N throughput.
            log.warning(
                f"batch_size ({training_params.batch_size}) is not "
                f"divisible by the device count ({len(devices)}); training "
                f"on only {usable} of {len(devices)} devices — choose a "
                "batch size divisible by the device count to use them all"
            )
    mesh = create_mesh(devices[:usable])
    log.info(f"Number of devices: {usable}")

    tx = build_optimizer(training_params.opt_con, training_params.opt_params)

    loss = custom_losses.custom_loss_objects.get(training_params.loss)
    if loss is None:
        raise ValueError(f"Loss '{training_params.loss}' not found.")

    sparse_labels = loss["takes_sparse"]
    loss_kwargs = dict(training_params.loss_fn_kwargs)
    if c_weight is not None and "class_weight" not in loss_kwargs:
        loss_kwargs["class_weight"] = c_weight
    loss_fn = loss["function"](
        num_classes=num_classes,
        is_y_true_sparse=sparse_labels,
        **loss_kwargs,
    )

    metric = custom_metrics.training_monitor_metric_objects.get(
        training_params.metric
    )
    if metric is None:
        raise ValueError(f"Metric '{training_params.metric}' not found.")
    metric_fn = metric(sparse_labels, num_classes)

    if not sparse_labels:
        train_labels_model = np.asarray(
            jax.nn.one_hot(train_labels[..., 0], num_classes), np.float32
        )
        val_labels_model = np.asarray(
            jax.nn.one_hot(val_labels[..., 0], num_classes), np.float32
        )
    else:
        train_labels_model = train_labels
        val_labels_model = val_labels

    training_dataset_md5 = utils.md5(training_dataset_path)
    rng = jax.random.PRNGKey(training_params.seed or 0)

    resume_meta, resume_leaves = None, None
    if training_params.resume_train_state:
        log.info(
            "Resuming full train state from: "
            f"{training_params.resume_train_state}"
        )
        resume_meta, resume_leaves = load_train_state(
            training_params.resume_train_state
        )
        saved_cfg = resume_meta.get("run_config", {})
        current_cfg = _resume_run_config(
            training_params, training_dataset_md5
        )
        # Checkpoints written before a run-config key existed can't be
        # checked on it — tolerate (with a warning) rather than making
        # every older train state permanently unresumable.
        unchecked = sorted(set(current_cfg) - set(saved_cfg))
        if unchecked:
            log.warning(
                "resume_train_state predates run-config keys %s; these "
                "cannot be checked against the checkpoint",
                unchecked,
            )
        mismatched = sorted(
            k for k in saved_cfg if saved_cfg[k] != current_cfg.get(k)
        )
        if mismatched:
            detail = (
                "resume_train_state run configuration mismatch on "
                f"{mismatched}: resume must use the hyperparameters the "
                "checkpoint was trained with (saved="
                f"{ {k: saved_cfg.get(k) for k in mismatched} }, current="
                f"{ {k: current_cfg.get(k) for k in mismatched} })"
            )
            if training_params.resume_config_check == "warn":
                log.warning(
                    "%s — continuing anyway (resume_config_check='warn'); "
                    "the bitwise-identical-resume guarantee does not hold",
                    detail,
                )
            else:
                raise ValueError(detail)
        model_name = resume_meta["model_name"]
        model_config = resume_meta["model_config"]
        model_class = get_model_class(model_name)
        # The saved config round-trips extension knobs (dtype,
        # pretrained_weights); model_hyperparameters may override the
        # non-structural ones (conflict-checked below), e.g. to resume a
        # float32 run in bfloat16.
        _check_hyperparameter_conflicts(
            model_config, training_params.model_hyperparameters, "resume"
        )
        model_container = model_class(
            **{**model_config, **training_params.model_hyperparameters}
        )
        module = model_container.build_model()
        model_architecture = model_name
        # Template variables only — every leaf is overwritten from the
        # checkpoint once the train state exists.
        variables = module.init(
            jax.random.PRNGKey(0),
            np.zeros((1, image_height, image_width, input_channels), np.float32),
            training=False,
        )
    elif training_params.initial_model:
        log.info(f"Resuming training from model: {training_params.initial_model}")
        model_name, model_config, variables, _ = model_io.load_checkpoint(
            training_params.initial_model
        )
        model_class = get_model_class(model_name)
        # The saved config round-trips extension knobs; fine-tuning may
        # override the non-structural ones via model_hyperparameters
        # (e.g. a bfloat16 compute dtype) — but never a structural key
        # the loaded weights were built with.
        _check_hyperparameter_conflicts(
            model_config, training_params.model_hyperparameters, "initial_model"
        )
        model_container = model_class(
            **{**model_config, **training_params.model_hyperparameters}
        )
        module = model_container.build_model()
        model_architecture = model_name
    else:
        model_architecture = training_params.model_architecture
        log.info(f"Starting training from scratch {model_architecture} model")
        model_class = get_model_class(model_architecture)
        model_container = model_class(
            input_channels=int(input_channels),
            num_classes=num_classes,
            image_height=int(image_height),
            image_width=int(image_width),
            **training_params.model_hyperparameters,
        )
        module = model_container.build_model()
        rng, init_rng = jax.random.split(rng)
        variables = module.init(
            init_rng,
            np.zeros((1, image_height, image_width, input_channels), np.float32),
            training=False,
        )
        # Pretrained initialisation (DeepLabV3+ ImageNet backbone, reference
        # `models/deeplabv3plus.py:91-95`); no-op for other containers.
        variables = model_container.apply_pretrained_weights(dict(variables))
        model_name = model_architecture

    state = create_train_state(dict(variables), tx, mesh)

    start_epoch = 0
    resume_best = None
    resume_es_best = None
    if resume_meta is not None:
        snapshot = {
            "params": state.params,
            "batch_stats": state.batch_stats,
        }
        template = {
            "state": state,
            "best": snapshot,
            "es_best": snapshot,
        }
        t_leaves, treedef = jax.tree_util.tree_flatten(template)
        if len(t_leaves) != len(resume_leaves):
            # Checkpoints written before the separate early-stopping
            # snapshot existed carry only {state, best}.
            template = {"state": state, "best": snapshot}
            t_leaves, treedef = jax.tree_util.tree_flatten(template)
        if len(t_leaves) != len(resume_leaves):
            raise ValueError(
                f"train-state checkpoint has {len(resume_leaves)} arrays "
                f"but this configuration expects {len(t_leaves)} — the "
                "model/optimizer configuration must match the saved run"
            )
        restored = jax.tree_util.tree_unflatten(treedef, resume_leaves)
        # Dtypes come from the template (the checkpoint stores exact
        # values; the template fixes structure, dtype, and — via the
        # replicated device_put below — multi-device placement).
        state = jax.tree_util.tree_map(
            lambda t, x: np.asarray(x, t.dtype), state, restored["state"]
        )
        if np.prod(mesh.devices.shape) > 1:
            from ..parallel.mesh import replicated

            state = jax.device_put(state, replicated(mesh))
        resume_best = restored["best"]
        resume_es_best = restored.get("es_best", restored["best"])
        start_epoch = int(resume_meta["epoch"])
        rng = jax.numpy.asarray(np.asarray(resume_meta["rng"], np.uint32))
        log.info(f"Resumed at epoch {start_epoch} (step {int(state.step)})")

    # Forward used inside the train/eval steps: the space-to-depth
    # transformed stack (ops/s2d_train.py — same parameter tree and
    # dropout masks, batch-statistics over real pixels) feeds the MXU
    # lanes fully on the high-resolution levels; "parity" forces the
    # plain Flax module (bit-level reference numerics).
    compute_module = module
    if training_params.train_forward_impl != "parity":
        from ..ops.s2d_train import maybe_build_s2d_train

        s2d_fwd = maybe_build_s2d_train(
            module, model_container.get_config(), image_height, image_width
        )
        if s2d_fwd is not None:
            log.info("Using s2d-transformed training forward")
            compute_module = s2d_fwd
        elif training_params.train_forward_impl == "s2d":
            raise ValueError(
                "train_forward_impl='s2d' requires an s2d-eligible U-Net "
                "config and image dims divisible by the transformed-level "
                "factor"
            )

    preprocess_fn = model_container.get_preprocess_input_fn()
    # Device-side augmentation: the generator keeps its mode logic
    # (which sample gets which aug) but skips the per-sample numpy
    # transforms — the jitted augmenter applies them batched on device,
    # where they cost ~1 ms instead of ~60 ms/batch of host time at the
    # flagship shape. "auto" uses it whenever every requested aug has a
    # device equivalent and training augments on the fly.
    device_augmenter = None
    if training_params.aug_device == "on" and (
        not training_params.aug_fly or training_params.aug_mode == "none"
    ):
        raise ValueError(
            "aug_device='on' requires aug_fly=True and an augmentation "
            "mode other than 'none'"
        )
    if (
        training_params.aug_device in ("auto", "on")
        and training_params.aug_fly
        and training_params.aug_mode != "none"
    ):
        from ..ops.augment import build_device_augmenter

        device_augmenter = build_device_augmenter(training_params.aug_fn_args)
        if device_augmenter is None and training_params.aug_device == "on":
            raise ValueError(
                "aug_device='on' but an augmentation has no device "
                "equivalent (only flip and gaussian/speckle noise do)"
            )
    use_aug_device = device_augmenter is not None

    # Each process assembles its local slice of the global batch.
    local_batch_size = training_params.batch_size // proc_count

    input_transform = None
    if use_aug_device:
        # Runs INSIDE the train step's jit (one dispatch per step):
        # per-sample augs from the generator's choices, then the model
        # preprocess (generator images are raw [0, 1] floats here).
        def input_transform(r, im, lb, ch):
            im, lb = device_augmenter(r, im, lb, ch)
            return preprocess_fn(im * 255.0), lb

        try:
            jax.eval_shape(
                input_transform,
                jax.random.PRNGKey(0),
                jax.ShapeDtypeStruct(
                    (
                        local_batch_size,
                        int(image_height),
                        int(image_width),
                        int(input_channels),
                    ),
                    np.float32,
                ),
                jax.ShapeDtypeStruct(
                    (local_batch_size,) + tuple(train_labels_model.shape[1:]),
                    np.float32,
                ),
                jax.ShapeDtypeStruct((local_batch_size,), np.int32),
            )
            log.info("Applying augmentations on device")
        except Exception as e:  # e.g. a numpy-only preprocess fn
            if training_params.aug_device == "on":
                raise ValueError(
                    "aug_device='on' but the device augmentation pipeline "
                    f"does not trace: {e}"
                )
            use_aug_device = False
            input_transform = None


    train_step = make_train_step(
        compute_module, tx, loss_fn, metric_fn, mesh,
        impl=training_params.train_step_impl,
        input_transform=input_transform,
    )
    eval_step = make_eval_step(
        compute_module, loss_fn, metric_fn, mesh,
        impl=training_params.train_step_impl,
    )

    monitor_name, monitor_mode = training_params.model_save_monitor
    valid_monitors = {
        "loss",
        "val_loss",
        training_params.metric,
        "val_" + training_params.metric,
    }
    if monitor_name not in valid_monitors:
        # Fail fast: silently monitoring val_loss while keeping a "max" mode
        # would invert best-checkpoint selection without warning.
        raise ValueError(
            f"Unknown model_save_monitor name {monitor_name!r}; valid names "
            f"for this run are {sorted(valid_monitors)}"
        )
    if monitor_mode not in ("min", "max"):
        # Same failure shape for the mode: treating 'Max'/'maximize' as
        # "not max" would silently converge best-checkpoint selection to
        # the WORST epoch.
        raise ValueError(
            f"Unknown model_save_monitor mode {monitor_mode!r}; "
            "must be 'min' or 'max'"
        )
    timestamp = utils.get_timestamp()
    # The run starts first so its id can nest the artifact folder
    # (reference keys everything on the MLflow run).
    tracker.start_run()
    save_foldername = (
        training_params.results_location
        / Path(tracker.run_id)
        / Path(f"{timestamp}_{model_architecture}")
    )
    if is_main_process:
        # Non-main processes train but write nothing (checkpoints, run
        # artifacts, and tracking are process-0 responsibilities).
        os.makedirs(save_foldername)
    tracker.set_run_folder(save_foldername)
    tb_writer = (
        get_tensorboard_writer(save_foldername / "tensorboard")
        if training_params.tensorboard and is_main_process
        else None
    )
    if training_params.checkpoint_format == "orbax":
        try:
            import orbax.checkpoint  # noqa: F401  (fail fast, not at epoch end)
        except ImportError as exc:
            raise RuntimeError(
                "checkpoint_format='orbax' requires the orbax-checkpoint "
                "package; install it or use the default 'hdf5' format"
            ) from exc
        ckpt_save, ckpt_suffix = model_io.save_model_orbax, ".orbax"
    else:
        ckpt_save, ckpt_suffix = model_io.save_model, ".hdf5"

    tracker.log_params(
        {
            "model_architecture": model_architecture,
            "training_dataset_path": str(training_dataset_path),
            "training_dataset_md5": training_dataset_md5,
            "augmentation_mode": training_params.aug_mode,
            "augmentations": training_params.augmentations,
            "loss_name": training_params.loss,
            "loss_fn_kwargs": training_params.loss_fn_kwargs,
            "metric_name": training_params.metric,
            "loss_fn_class_weight": training_params.class_weight,
            "class_weight_array": c_weight,
        }
    )
    tracker.log_dict(model_container.get_config(), "model/data/model_config.json")

    if training_params.aug_val:
        aug_val_mode = training_params.aug_mode
        aug_val_fn_args = training_params.aug_fn_args
        aug_val_probs = training_params.aug_probs
        aug_val_fly = training_params.aug_fly
    else:
        aug_val_mode, aug_val_fn_args, aug_val_probs, aug_val_fly = (
            "none",
            [],
            (),
            False,
        )

    history = training_callbacks.SaveEpochInfo(
        save_folder=save_foldername,
        train_params=training_params,
        start_epoch=start_epoch,
    )

    param_count = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    model_summary = (
        f"{model_architecture}: {param_count} parameters, input "
        f"({image_height}x{image_width}x{input_channels}), {num_classes} classes"
    )
    # The reference snapshots the optimizer's FULL config as
    # ``opt_param: <key>`` attrs (`training/training.py:124-130`);
    # resolve user params over the factory's defaults with Keras-style
    # names so the artifact records beta_1/beta_2/epsilon etc. too.
    opt_config = resolved_optimizer_config(
        training_params.opt_con, training_params.opt_params
    )
    if is_main_process:
        save_training_params_file(
            save_foldername,
            model_summary,
            model_container.get_config(),
            training_dataset_md5,
            c_weight,
            timestamp,
            training_params,
            opt_config,
        )

    train_gen = data_gen.DataGenerator(
        train_images,
        train_labels_model,
        local_batch_size,
        training_params.aug_fn_args,
        training_params.aug_mode,
        training_params.aug_probs,
        training_params.aug_fly,
        preprocess_fn,
        shuffle=training_params.shuffle,
        seed=training_params.seed,
        aug_device=use_aug_device,
    )
    val_gen = data_gen.DataGenerator(
        val_images,
        val_labels_model,
        local_batch_size,
        aug_val_fn_args,
        aug_val_mode,
        aug_val_probs,
        aug_val_fly,
        preprocess_fn,
        shuffle=training_params.shuffle,
        seed=training_params.seed,
    )

    for name, gen in (("training", train_gen), ("validation", val_gen)):
        total = gen.get_total_samples()
        if local_batch_size > total:
            raise ValueError(
                f"The batch size ({local_batch_size}) cannot be "
                f"larger than the number of {name} samples ({total})"
            )
        log.info(f"{name} generator total number of samples: {total}")

    # --- precise-BN machinery (ops/bn_refresh.py), shared by the
    # per-epoch validation refresh (bn_precise_val) and checkpoint
    # finalization (bn_precise_stats). One BNRefresher instance so the
    # extraction forward compiles once for the whole run.
    bn_refresher = None
    if (
        training_params.bn_precise_stats or training_params.bn_precise_val
    ) and state.batch_stats:
        from ..ops.bn_refresh import BNRefresher

        bn_refresher = BNRefresher(compute_module)

    # Equal-size batches (the law-of-total-variance aggregation assumes
    # them). When the training set is smaller than the batch size
    # (possible with precomputed augmentation modes, whose generator
    # guard counts augmented samples) fall back to one all-images batch
    # instead of zero batches.
    stat_bs = min(local_batch_size, len(train_images))
    n_stat_full = (len(train_images) // stat_bs) * stat_bs

    # Device-resident cache of the preprocessed stat batches: the
    # per-epoch bn_precise_val refresh iterates the SAME un-augmented
    # training images every epoch, and re-uploading them dominates the
    # refresh cost on slow host->device links (measured r5: ~160 MB
    # per epoch at flagship scale turned 6.7 s epochs into ~25 s over
    # the tunnel). Capped so huge datasets stream instead of exhausting
    # HBM; the one-shot finalization path streams identically either
    # way.
    _stat_cache: list = []
    # Decided from the FIRST produced batch's actual nbytes (not
    # estimated from the raw images): preprocess_fn may change shape or
    # dtype, and an estimate that undercounts defeats the HBM guard.
    _stat_cache_ok: list = []

    def _stat_batches():
        if len(_stat_cache) == n_stat_full // stat_bs:
            yield from _stat_cache
            return
        _stat_cache.clear()  # partially-filled (interrupted first pass)
        for start in range(0, n_stat_full, stat_bs):
            batch = jnp.asarray(
                preprocess_fn(
                    train_images[start : start + stat_bs].astype(np.float32)
                )
            )
            if not _stat_cache_ok:
                _stat_cache_ok.append(
                    batch.nbytes * (n_stat_full // stat_bs)
                    <= int(
                        os.environ.get(
                            "OCTSEG_BN_STAT_CACHE_BYTES", str(1 << 29)
                        )
                    )
                )
            if _stat_cache_ok[0]:
                _stat_cache.append(batch)
            yield batch

    def _refresh_stats(params, stats, key):
        """Precise population BN stats of the (un-augmented) local
        training shard under ``params``; multi-host runs aggregate the
        accumulators across every process's shard (all processes must
        call this together)."""
        if proc_count > 1:
            # plain-jit inputs must be process-addressable (stats are
            # only a first-call shape template — no fetch needed)
            params = jax.device_get(params)
        return bn_refresher(
            params,
            stats,
            _stat_batches(),
            rng=key,
            cross_process=proc_count > 1,
        )

    bn_refresh_base_key = jax.random.PRNGKey(
        0 if training_params.seed is None else training_params.seed
    )
    use_precise_val = training_params.bn_precise_val and bn_refresher is not None
    if use_precise_val:
        log.info(
            "Epoch val metrics use precise-BN statistics refreshed under "
            "each epoch's weights (bn_precise_val=True; one extra forward "
            "pass over the training set per epoch — set False for "
            "Keras-exact rolling-statistics val metrics)"
        )

    best_monitor = None
    best_es = None
    best_ckpt_path = None
    best_ckpt_variables = None
    best_ckpt_epoch = None
    best_variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    # Early stopping tracks val_<metric>/max (its own monitor, which may
    # differ from model_save_monitor) and — like Keras 2.9 EarlyStopping —
    # restores its best snapshot only when stopping actually triggers.
    es_best_variables = best_variables
    stopped_early = False
    epochs_since_improvement = 0
    if resume_meta is not None:
        # Restore the generators' sampling state (RNG stream + shuffle
        # order) so the resumed run sees exactly the sample order an
        # uninterrupted run would from this epoch on — including
        # aug_mode="one"'s per-sample draws, which epoch-count replay
        # alone could not reproduce.
        train_gen.set_state(resume_meta["train_gen_state"])
        val_gen.set_state(resume_meta["val_gen_state"])
        best_variables = resume_best
        es_best_variables = resume_es_best
        best_monitor = resume_meta["best_monitor"]
        best_es = resume_meta["best_es"]
        epochs_since_improvement = int(
            resume_meta["epochs_since_improvement"]
        )
        resume_best_epoch = resume_meta.get("best_ckpt_epoch")
        if training_params.model_save_best and resume_best_epoch is not None:
            # Re-materialize the carried best-on-monitor checkpoint into
            # THIS run's results folder. The interrupted run skips the
            # precise-BN finalization (its grace period is for writing
            # artifacts, not extra data passes), so its model_epochNN
            # file holds rolling statistics even though the precise val
            # metric selected it; and if no post-resume epoch improves,
            # nothing in this folder would hold the selected-best
            # weights at all. Writing it here (and tracking it for the
            # finalization re-save) makes the resumed folder
            # self-contained and guarantees the selected-best checkpoint
            # eventually gets precise statistics. Old train states
            # (no best_ckpt_epoch) keep the previous behavior.
            best_ckpt_epoch = int(resume_best_epoch)
            best_ckpt_path = (
                save_foldername
                / f"model_epoch{best_ckpt_epoch:02d}{ckpt_suffix}"
            )
            best_ckpt_variables = resume_best
            if is_main_process:
                ckpt_save(
                    best_ckpt_path,
                    model_name,
                    model_container.get_config(),
                    resume_best,
                )
        if (
            training_params.early_stopping
            and epochs_since_improvement >= training_params.patience
        ):
            # The saved state was written in the very iteration whose
            # end-of-epoch patience check would have stopped training
            # (the uninterrupted run trained no further) — resuming must
            # not run extra epochs, only finalize.
            log.info(
                f"Resumed train state is already early-stopped "
                f"(patience {training_params.patience}); "
                "skipping straight to finalization"
            )
            start_epoch = training_params.epochs
            # the uninterrupted run's patience check fired — finalization
            # must see the same stopped-early restore semantics
            stopped_early = True
    if is_main_process:
        history.on_train_begin()

    # Preemption-safe interruption: with train_state_checkpoint on,
    # SIGTERM/SIGINT finish the current batch, skip remaining epochs, and
    # fall through to the normal finalization (best-weight restore, final
    # checkpoint) — the rolling train-state file from the last completed
    # epoch is the resume point.
    interrupt_flag = []

    def _collective_any(flag) -> bool:
        """Cross-process agreement on a local boolean: True anywhere ->
        True everywhere. Every decision derived from the (per-process)
        interrupt flag MUST go through this one helper — the epoch
        loop's stop and the finalization's refresh-skip both gate
        cross-process collectives, and a process-local decision at
        either site would leave the other processes blocked in the next
        allgather/refresh forever."""
        flag = bool(flag)
        if proc_count > 1 and training_params.train_state_checkpoint:
            from jax.experimental import multihost_utils

            return bool(
                np.asarray(
                    multihost_utils.process_allgather(np.int32(flag))
                ).any()
            )
        return flag

    prev_handlers = {}
    if training_params.train_state_checkpoint:
        import signal as _signal

        def _on_signal(signum, frame):
            log.warning(
                "Received signal %s — stopping at the next batch boundary",
                signum,
            )
            interrupt_flag.append(signum)

        for _sig in (_signal.SIGTERM, _signal.SIGINT):
            try:
                prev_handlers[_sig] = _signal.signal(_sig, _on_signal)
            except ValueError:  # not the main thread
                break

    try:
        for epoch in range(start_epoch, training_params.epochs):
            if is_main_process:
                history.on_epoch_begin(epoch)
            profile_ctx = (
                profiling.trace(training_params.profile_dir)
                if epoch == 0
                else contextlib.nullcontext()
            )
            train_losses, train_metrics = [], []
            with profile_ctx:
                # Host batch assembly + H2D transfer overlap device compute
                # (double-buffered prefetch onto the mesh). With aug_device
                # the generator emits a third per-sample aug-choice array
                # that rides into the step's jit.
                if use_aug_device:
                    batches = (
                        (
                            np.asarray(bi, np.float32),
                            np.asarray(bl),
                            np.asarray(bc, np.int32),
                        )
                        for bi, bl, bc in train_gen
                    )
                else:
                    batches = (
                        (np.asarray(bi, np.float32), np.asarray(bl))
                        for bi, bl in train_gen
                    )
                for batch in prefetch_to_mesh(batches, mesh):
                    # Per-batch stop only in single-process runs: on
                    # multi-host, uncoordinated breaks would leave the other
                    # processes blocked in the next step's collectives.
                    if interrupt_flag and proc_count == 1:
                        break
                    rng, step_rng = jax.random.split(rng)
                    state, loss_val, metric_val = train_step(
                        state, batch[0], batch[1], step_rng, *batch[2:]
                    )
                    train_losses.append(loss_val)
                    train_metrics.append(metric_val)
            # Epoch-boundary agreement: every process reaches this
            # collective after the same number of steps, so the run stops
            # on all hosts together (or on none).
            stop_now = _collective_any(interrupt_flag)
            if stop_now:
                state_file = save_foldername / TRAIN_STATE_FILENAME
                if state_file.exists():
                    log.warning(
                        "Training interrupted during epoch %d; finalizing. "
                        "Resume with resume_train_state=%s"
                        + (
                            ". NB the precise-BN finalization is SKIPPED on "
                            "interrupt — this folder's checkpoints keep "
                            "rolling BatchNorm statistics (their eval-mode "
                            "quality can read far below the logged val "
                            "metrics); the resumed run re-saves the selected "
                            "best checkpoint with precise statistics at its "
                            "own finalization"
                            if training_params.bn_precise_stats
                            else ""
                        ),
                        epoch + 1,
                        state_file,
                    )
                else:
                    log.warning(
                        "Training interrupted during epoch %d before any "
                        "epoch completed — no train-state resume point was "
                        "written; final artifacts reflect the partial run",
                        epoch + 1,
                    )
                break
            train_gen.on_epoch_end()

            # Validation state: with bn_precise_val the metrics that drive
            # best-checkpoint selection and early stopping are computed
            # with population statistics refreshed under THIS epoch's
            # weights — the rolling statistics in the train state are NOT
            # overwritten (the training trajectory and, with
            # bn_precise_stats=False, the saved rolling stats stay
            # bitwise reference-exact).
            if use_precise_val:
                val_state = state._replace(
                    batch_stats=_refresh_stats(
                        state.params,
                        state.batch_stats,
                        jax.random.fold_in(bn_refresh_base_key, epoch),
                    )
                )
            else:
                val_state = state
            val_losses, val_metrics = [], []
            val_batches = (
                (np.asarray(bi, np.float32), np.asarray(bl)) for bi, bl in val_gen
            )
            for images, labels in prefetch_to_mesh(val_batches, mesh):
                loss_val, metric_val = eval_step(val_state, images, labels)
                val_losses.append(loss_val)
                val_metrics.append(metric_val)
            val_gen.on_epoch_end()

            logs = {
                "loss": float(np.mean([np.asarray(x) for x in train_losses])),
                training_params.metric: float(
                    np.mean([np.asarray(x) for x in train_metrics])
                ),
                "val_loss": float(np.mean([np.asarray(x) for x in val_losses])),
                "val_"
                + training_params.metric: float(
                    np.mean([np.asarray(x) for x in val_metrics])
                ),
            }
            log.info(f"Epoch {epoch + 1}/{training_params.epochs}: {logs}")
            if is_main_process:
                history.on_epoch_end(epoch, logs)
            tracker.log_metrics(logs, step=epoch + 1)
            if tb_writer is not None:
                tb_writer.log_metrics(logs, step=epoch + 1)

            monitored = logs[monitor_name]
            improved = _monitor_improved(monitored, best_monitor, monitor_mode)
            # Snapshot to host: the train step donates the state buffers, so a
            # device-side alias would be invalidated next epoch.
            state_host = {
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
            }
            if improved:
                best_monitor = monitored
                best_variables = state_host
            if improved or not training_params.model_save_best:
                # remember the file AND the weights it holds (with
                # model_save_best=False the last file is last-epoch
                # weights, not best-monitor weights) for the precise-BN
                # re-save at finalization. Tracked on EVERY process —
                # the metrics driving `improved` are global collectives,
                # so all processes agree, and the multi-host finalization
                # refresh needs every process to participate.
                best_ckpt_path = (
                    save_foldername / f"model_epoch{epoch + 1:02d}{ckpt_suffix}"
                )
                best_ckpt_variables = state_host
                best_ckpt_epoch = epoch + 1
                if is_main_process:
                    ckpt_save(
                        best_ckpt_path,
                        model_name,
                        model_container.get_config(),
                        state_host,
                    )

            # Early stopping on val_<metric>, mode max, like the reference
            # (`training/training.py:335-342`).
            if training_params.early_stopping:
                es_value = logs["val_" + training_params.metric]
                if best_es is None or es_value > best_es:
                    best_es = es_value
                    epochs_since_improvement = 0
                    es_best_variables = state_host
                else:
                    epochs_since_improvement += 1

            if training_params.train_state_checkpoint and is_main_process:
                save_train_state(
                    save_foldername / TRAIN_STATE_FILENAME,
                    {
                        "state": jax.device_get(state),
                        "best": best_variables,
                        "es_best": es_best_variables,
                    },
                    {
                        "epoch": epoch + 1,
                        "rng": np.asarray(rng).tolist(),
                        "best_monitor": best_monitor,
                        "best_es": best_es,
                        "best_ckpt_epoch": best_ckpt_epoch,
                        "epochs_since_improvement": epochs_since_improvement,
                        "model_name": model_name,
                        "model_config": model_container.get_config(),
                        "run_config": _resume_run_config(
                            training_params, training_dataset_md5
                        ),
                        "train_gen_state": train_gen.get_state(),
                        "val_gen_state": val_gen.get_state(),
                    },
                )

            if training_params.early_stopping:
                if epochs_since_improvement >= training_params.patience:
                    log.info(
                        f"Early stopping at epoch {epoch + 1} "
                        f"(patience {training_params.patience})"
                    )
                    stopped_early = True
                    break

    finally:
        # Always restore the process's signal handlers — an exception
        # mid-training must not leave SIGTERM/SIGINT hijacked to a dead
        # flag for the rest of the process.
        if prev_handlers:
            import signal as _signal

            for _sig, _h in prev_handlers.items():
                # signal.signal() returns None when the previous handler
                # was installed from C — passing that back raises.
                if _h is None:
                    _h = _signal.SIG_DFL
                _signal.signal(_sig, _h)

    if is_main_process:
        history.on_train_end()

    # Keras 2.9 EarlyStopping semantics (the reference adds the callback at
    # `training/training.py:335-342`): restore_best_weights applies only
    # when early stopping actually triggered, and restores the callback's
    # OWN best (val_<metric>/max) — not model_save_monitor's best. A run
    # that completes all its epochs keeps last-epoch weights.
    if (
        training_params.early_stopping
        and stopped_early
        and training_params.restore_best_weights
    ):
        final_variables = es_best_variables
    else:
        final_variables = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }

    # Precise-BN finalization (ops/bn_refresh.py): replace the rolling
    # BatchNorm statistics — a momentum-0.99 trajectory average that
    # lags the final weights — with exact population statistics of the
    # (un-augmented) training data under those weights. One extra pass
    # over the training set; measurably restores eval-mode accuracy to
    # train-mode level (see bn_refresh module docstring). Multi-host
    # runs aggregate the statistics across every process's data shard
    # (law-of-total-variance psum — every process participates; only
    # process 0 saves the result).
    # Skipped after a SIGTERM/SIGINT interrupt: the grace period is for
    # writing final artifacts, not for extra full-dataset passes — the
    # interrupted checkpoint keeps rolling stats (the interrupt warning
    # discloses this), and the RESUMED run's finalization performs the
    # refresh, including for the carried best-on-monitor checkpoint
    # (re-materialized into the resumed folder at resume — see the
    # best_ckpt_epoch restore above). The skip decision must be
    # COLLECTIVE on multi-host runs: the refresh's cross-process
    # aggregation is a collective, so a signal that reached only a
    # subset of processes would leave the others blocked in it forever
    # (same agreement pattern as the epoch loop's stop_now).
    interrupted = _collective_any(interrupt_flag)
    precise_stats_applied = (
        training_params.bn_precise_stats
        and bool(final_variables.get("batch_stats"))
        and not interrupted
    )
    if precise_stats_applied:
        log.info(
            "Finalizing BatchNorm statistics: exact population stats over "
            f"{n_stat_full * proc_count} training images "
            "(bn_precise_stats=True; set False for reference-exact rolling "
            "statistics). Only model_final and the recorded best/last "
            "model_epochNN file carry the precise statistics; earlier "
            "per-epoch checkpoint files keep their rolling statistics."
        )

        def _with_precise_stats(variables):
            return {
                "params": variables["params"],
                "batch_stats": jax.device_get(
                    _refresh_stats(
                        variables["params"],
                        variables["batch_stats"],
                        bn_refresh_base_key,
                    )
                ),
            }

        final_variables = _with_precise_stats(final_variables)
        # The best-on-monitor checkpoint is what reference-workflow users
        # deploy (`model_epochNN`); re-save it with precise statistics
        # under ITS OWN weights so it gets the same eval-mode fix. When
        # it holds the same weights as the finalized state (completed
        # run whose last epoch improved; early-stop restore), reuse the
        # stats just computed instead of paying a second full pass.
        # Every process runs the refresh (the multi-host aggregation is
        # collective); only the main process writes the file.
        if best_ckpt_path is not None:
            same_weights = all(
                np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(
                    jax.tree_util.tree_leaves(best_ckpt_variables["params"]),
                    jax.tree_util.tree_leaves(final_variables["params"]),
                )
            )
            best_final = (
                final_variables
                if same_weights
                else _with_precise_stats(best_ckpt_variables)
            )
            if is_main_process:
                ckpt_save(
                    best_ckpt_path,
                    model_name,
                    model_container.get_config(),
                    best_final,
                )

    if is_main_process:
        # The attrs written at run start record the CONFIGURED knobs;
        # this one records whether the precise-stats finalization
        # actually happened — a SIGTERM-interrupted run (or a BN-less
        # model) ships rolling-stats checkpoints despite
        # bn_precise_stats=True, and downstream parity comparisons need
        # the applied semantics, not the intent.
        try:
            with h5py.File(
                save_foldername / "training_params.hdf5", "a"
            ) as f:
                f.attrs["bn_precise_stats_applied"] = bool(
                    precise_stats_applied
                )
        except OSError:  # artifact missing/unwritable: never fail the run
            log.warning(
                "could not record bn_precise_stats_applied in "
                "training_params.hdf5"
            )
        final_path = save_foldername / f"model_final{ckpt_suffix}"
        ckpt_save(
            final_path,
            model_name,
            model_container.get_config(),
            final_variables,
        )
        # MLflow model-artifact round trip (reference autologs the trained
        # model under the run's `model/` artifact path,
        # `training/training.py:140-141`; `load_model_and_config` resolves
        # it back by run id, `common/utils.py:37-51`). Orbax checkpoints
        # are directories, which log_artifact does not take — the HDF5
        # final checkpoint is the round-trippable artifact.
        # (model_config.json already lives at model/data/ — logged via
        # tracker.log_dict at run start, matching the reference's early
        # mlflow.log_dict — so only the checkpoint is uploaded here.)
        if final_path.is_file():
            tracker.log_artifact(final_path, artifact_path="model")
    if tb_writer is not None:
        tb_writer.close()
    tracker.end_run()
    return save_foldername
