"""Jitted, mesh-sharded train/eval steps.

Data parallelism over the ``data`` mesh axis — the TPU-native replacement
for the reference's MirroredStrategy step
(`training/training.py:185-188,243-266`). Two implementations:

- ``impl="spmd"``: one logical train step as a plain jit whose layout
  follows the input placement; XLA inserts the gradient all-reduce when
  the batch arrives sharded. Compiles to the same fused convolutions as
  single-device code (the explicit shard_map lowering is ~8x slower for
  the U-Net backward on this v5e stack) and computes BatchNorm statistics
  over the whole batch (sync-BN).
- ``impl="shard_map"``: explicit per-device step with ``pmean`` gradients
  and mean-reduced per-replica BatchNorm statistics — matching Keras
  MirroredStrategy semantics exactly (per-replica BN, mirrored-variable
  ``aggregation=MEAN``), and the explicit-collective formulation of
  BASELINE.md config #4.
- ``impl="auto"`` (default): ``spmd`` on a single-device mesh (where the
  two are semantically identical — one replica — and spmd is much
  faster) and ``shard_map`` on multi-device meshes (reference-parity BN
  semantics).
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

def _shard_map(f, mesh, in_specs, out_specs):
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def _mesh_axis(mesh: Mesh) -> str:
    """The mesh's data axis name. Collectives and specs must use the
    NAME BOUND ON THE MESH (create_mesh accepts a custom axis_name);
    hardcoding DATA_AXIS would fail at trace time on such meshes."""
    if len(mesh.axis_names) != 1:
        raise ValueError(
            f"expected a 1-D data-parallel mesh, got axes {mesh.axis_names}"
        )
    return mesh.axis_names[0]


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    variables, tx: optax.GradientTransformation, mesh: Mesh = None
) -> TrainState:
    params = variables["params"]
    state = TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    if mesh is not None and np.prod(mesh.devices.shape) > 1:
        from .mesh import replicated

        state = jax.device_put(state, replicated(mesh))
    return state


def make_train_step(
    module,
    tx: optax.GradientTransformation,
    loss_fn: Callable,
    metric_fn: Callable,
    mesh: Mesh,
    impl: str = "auto",
    input_transform: Callable = None,
) -> Callable:
    """Returns ``train_step(state, images, labels, rng) ->
    (state, loss, metric)`` jitted over the mesh.

    ``input_transform(rng, images, labels, choices) -> (images, labels)``
    — optional device-side batch preparation (augmentation + model
    preprocess) run INSIDE the step's jit (one dispatch; XLA fuses it
    into the forward's input). When set, the step takes an extra
    per-sample ``choices`` argument: ``train_step(state, images,
    labels, rng, choices)``."""
    if impl == "auto":
        impl = "spmd" if mesh.devices.size == 1 else "shard_map"
    if impl == "spmd":
        return _make_train_step_spmd(
            module, tx, loss_fn, metric_fn, mesh, input_transform
        )
    if impl != "shard_map":
        raise ValueError(f"unknown train step impl: {impl}")
    axis = _mesh_axis(mesh)

    def local_step(state: TrainState, images, labels, rng, choices=None):
        # Per-device batch shard; fold the data-axis index into the dropout
        # key so replicas draw independent masks.
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        if input_transform is not None:
            rng, aug_rng = jax.random.split(rng)
            images, labels = input_transform(aug_rng, images, labels, choices)

        def compute_loss(params):
            out, mutated = module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                training=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            return loss_fn(labels, out), (out, mutated["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)

        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        new_stats = jax.lax.pmean(new_stats, axis)
        metric = jax.lax.pmean(metric_fn(labels, out), axis)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_stats, new_opt_state, state.step + 1),
            loss,
            metric,
        )

    in_specs = (P(), P(axis), P(axis), P())
    if input_transform is not None:
        in_specs = in_specs + (P(axis),)
    sharded = _shard_map(
        local_step,
        mesh,
        in_specs=in_specs,
        out_specs=(P(), P(), P()),
    )
    return jax.jit(sharded, donate_argnums=(0,))


def _make_train_step_spmd(
    module, tx, loss_fn, metric_fn, mesh: Mesh, input_transform=None
):
    # No sharding annotations: the step is a plain jit and the layout
    # follows the input shardings (batch placed sharded by shard_batch,
    # state replicated) — XLA propagates and inserts the gradient
    # all-reduce. Explicit in_shardings/out_shardings force the SPMD
    # partitioner even on a 1-device mesh, which compiles pathologically
    # on this TPU stack (~8x slower step).
    del mesh

    def step(state: TrainState, images, labels, rng, choices=None):
        if input_transform is not None:
            rng, aug_rng = jax.random.split(rng)
            images, labels = input_transform(aug_rng, images, labels, choices)

        def compute_loss(params):
            out, mutated = module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                training=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            return loss_fn(labels, out), (out, mutated["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        metric = metric_fn(labels, out)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_stats, new_opt_state, state.step + 1),
            loss,
            metric,
        )

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(
    module,
    loss_fn: Callable,
    metric_fn: Callable,
    mesh: Mesh,
    impl: str = "auto",
):
    """Returns ``eval_step(state, images, labels) -> (loss, metric)``."""
    if impl == "auto":
        impl = "spmd" if mesh.devices.size == 1 else "shard_map"
    if impl == "spmd":
        def step(state: TrainState, images, labels):
            out = module.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                images,
                training=False,
            )
            return loss_fn(labels, out), metric_fn(labels, out)

        return jax.jit(step)
    if impl != "shard_map":
        raise ValueError(f"unknown eval step impl: {impl}")
    axis = _mesh_axis(mesh)

    def local_step(state: TrainState, images, labels):
        out = module.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            training=False,
        )
        return (
            jax.lax.pmean(loss_fn(labels, out), axis),
            jax.lax.pmean(metric_fn(labels, out), axis),
        )

    sharded = _shard_map(
        local_step,
        mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded)


# --- name-based optimizer surface (one source of truth for both the
# --- constructed transformation and the artifact snapshot) ----------

_OPTIMIZER_FACTORIES = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "adagrad": optax.adagrad,
    "nadam": optax.nadam,
    "adamax": optax.adamax,
}
# The Keras class __name__ for each factory key — what the pinned TF 2.9
# reference records both as the ``optimizer`` artifact attr
# (`training/training.py:120-122`) and as ``optimizer.get_config()["name"]``
# (`training/training.py:124-130`). One table serves both writers so the
# two attrs in one artifact can never disagree on casing.
KERAS_OPTIMIZER_NAMES = {
    "adam": "Adam",
    "adamw": "AdamW",
    "sgd": "SGD",
    "rmsprop": "RMSprop",
    "adagrad": "Adagrad",
    "nadam": "Nadam",
    "adamax": "Adamax",
}
# Keras arg names (the user surface, mirroring the reference's
# keras.optimizers kwargs) <-> optax factory arg names.
_KERAS_TO_OPTAX = {"beta_1": "b1", "beta_2": "b2", "epsilon": "eps"}
_OPTAX_TO_KERAS = {v: k for k, v in _KERAS_TO_OPTAX.items()}
# Keras's epsilon default (optax's is 1e-8); the reference's optimizers
# run with 1e-7 (`training/training.py:193` via keras.optimizers).
_KERAS_EPSILON_DEFAULT = 1e-7


def _keras_default_learning_rate(name: str) -> float:
    # every Keras optimizer here defaults to 1e-3 EXCEPT SGD's 0.01
    return 0.01 if name == "sgd" else 1e-3


def _resolve_named_params(name: str, opt_params: dict) -> dict:
    """User params (Keras OR optax arg names accepted) resolved over
    the Keras-semantics defaults, in OPTAX arg names — exactly what the
    factory is called with."""
    params = {
        _KERAS_TO_OPTAX.get(k, k): v for k, v in dict(opt_params).items()
    }
    params.setdefault("learning_rate", _keras_default_learning_rate(name))
    if "eps" in inspect.signature(_OPTIMIZER_FACTORIES[name]).parameters:
        params.setdefault("eps", _KERAS_EPSILON_DEFAULT)
    if name == "rmsprop" and "rho" in params:
        # Keras RMSprop calls optax's ``decay`` "rho"
        params["decay"] = params.pop("rho")
    return params


def resolved_optimizer_config(opt_con, opt_params: dict) -> dict:
    """The optimizer's full effective config in Keras-style key names —
    the analog of the reference's ``optimizer.get_config()`` snapshot
    (`training/training.py:124-130`). Derived from the SAME resolution
    path ``build_optimizer`` constructs with (user params over
    Keras-semantics defaults), then the factory's remaining scalar
    defaults, so the artifact records beta_1/beta_2/epsilon etc. and
    can never contradict what the optimizer actually ran with.

    Non-name optimizers (a ready optax transformation or factory) have
    no introspectable Keras-style surface; their snapshot is the user's
    params, unchanged."""
    if isinstance(opt_con, optax.GradientTransformation) or callable(opt_con):
        return dict(opt_params)
    name = str(opt_con).lower()
    factory = _OPTIMIZER_FACTORIES.get(name)
    if factory is None:
        return dict(opt_params)

    def keras_key(optax_key):
        if name == "rmsprop" and optax_key == "decay":
            return "rho"
        return _OPTAX_TO_KERAS.get(optax_key, optax_key)

    # TF 2.9's get_config()["name"] carries the Keras class casing
    # ("Adam"); Keras 3 lowercased it, but the reference pins TF 2.9.
    cfg = {"name": KERAS_OPTIMIZER_NAMES.get(name, name)}
    for pname, p in inspect.signature(factory).parameters.items():
        if p.default is not inspect.Parameter.empty and isinstance(
            p.default, (bool, int, float, str)
        ):
            cfg[keras_key(pname)] = p.default
    cfg.update(
        (keras_key(k), v)
        for k, v in _resolve_named_params(name, opt_params).items()
    )
    return cfg


def build_optimizer(opt_con, opt_params: dict) -> optax.GradientTransformation:
    """Optimizer factory accepting a name ('Adam', 'sgd', ...) with
    Keras-style kwargs, an optax factory, or a ready transformation —
    covering the reference's ``opt_con``/``opt_params`` surface
    (`training/training.py:190-193`). Name-based construction uses
    Keras defaults (learning rate, epsilon=1e-7) so training numerics
    match the reference's keras.optimizers."""
    if isinstance(opt_con, optax.GradientTransformation):
        return opt_con
    if callable(opt_con):
        params = {
            _KERAS_TO_OPTAX.get(k, k): v for k, v in dict(opt_params).items()
        }
        return opt_con(**params)
    name = str(opt_con).lower()
    if name not in _OPTIMIZER_FACTORIES:
        raise ValueError(f"Unknown optimizer: {opt_con}")
    return _OPTIMIZER_FACTORIES[name](**_resolve_named_params(name, opt_params))
