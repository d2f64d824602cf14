"""Batched on-device inference pipelines.

The reference predicts image-by-image with ``batch_size=1`` and does all
post-processing (argmax, boundary-map conversion, Dijkstra, area masks) in
NumPy/Python on the host (`prediction/prediction.py:70-159`). Here the
whole chain runs on TPU, batched:

  uint8 images -> preprocess -> model -> softmax -> argmax/one-hot ->
  boundary maps -> min-path delineation -> area masks

Two variants:
- :class:`StagedPipeline`: three jitted stages (model / convert / graph)
  so the per-phase wall-clock timers the reference persists
  (`prediction/prediction.py:74-159`) stay meaningful;
- :func:`make_fused_pipeline`: one jit for the entire chain (used by the
  benchmark and streaming volume inference) — XLA fuses the elementwise
  conversion into the conv epilogue and the DP runs without leaving HBM.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from . import boundary as boundary_ops
from . import minpath as minpath_ops


def select_optimized_forward(
    module,
    variables,
    model_config,
    compute_dtype: str = "float32",
    s2d_output: str = "labels_s2d",
    optimize: bool = True,
):
    """Single decision point for the optimized inference forward.

    Returns ``(s2d_fn, apply_fn, forward_variables, kind, s2d_div)``
    where ``kind`` is "s2d" (U-Net space-to-depth path — with the
    default ``s2d_output="labels_s2d"`` pass ``s2d_fn`` to
    :func:`make_fused_pipeline`'s ``labels_apply_fn``; the staged
    pipeline asks for ``s2d_output="probs"`` instead), "folded"
    (BN-folded DeepLabV3+ — pass ``apply_fn`` and use
    ``forward_variables`` as the pipeline's weights argument), or
    "parity" (no fast path; plain ``module.apply``). ``s2d_div`` is the
    spatial divisor inputs must satisfy to use the s2d path. Shared by
    the staged pipeline, the streaming segmenter and the StableHLO
    exporter so the selection order and dtype plumbing cannot drift
    between surfaces.

    Raises ``ValueError`` when ``compute_dtype`` is not float32 and no
    fast path applies: the parity forward always runs float32, and
    silently ignoring the requested dtype would misreport the
    accuracy/memory tradeoff.
    """
    from ..models.deeplabv3plus import maybe_build_folded_apply
    from .s2d_unet import maybe_build_s2d_apply

    dtype = jnp.dtype(compute_dtype)
    s2d_fn, s2d_div, apply_fn, folded_vars = None, 1, None, None
    if optimize:
        s2d_fn, s2d_div = maybe_build_s2d_apply(
            module, variables, model_config, output=s2d_output, dtype=dtype
        )
        if s2d_fn is None:
            apply_fn, folded_vars = maybe_build_folded_apply(
                module, variables, dtype=dtype
            )
    if s2d_fn is not None:
        return s2d_fn, None, variables, "s2d", s2d_div
    if apply_fn is not None:
        return None, apply_fn, folded_vars, "folded", 1
    if compute_dtype != "float32":
        reason = (
            "optimize=False"
            if not optimize
            else "the model has no optimized inference variant"
        )
        raise ValueError(
            f"compute_dtype={compute_dtype!r} is only honored by the "
            f"optimized fast paths (s2d U-Net / BN-folded DeepLabV3+), "
            f"which are unavailable here ({reason}); use "
            "compute_dtype='float32' or an eligible model with "
            "optimize=True"
        )
    return None, None, variables, "parity", 1


class StagedPipeline:
    """Jit-per-stage inference over uint8 image batches.

    When ``optimize`` is on (default) and the model is a U-Net whose
    config qualifies, the predict stage runs the space-to-depth
    transformed conv stack (:mod:`.s2d_unet` — BN folded, top levels in
    s2d(2) layout; ~1.7x faster on v5e at 512x1024) for inputs whose
    spatial dims divide the transformed-level factor; other inputs fall
    back to the parity module.
    """

    def __init__(
        self,
        module,
        variables: dict,
        preprocess_fn: Callable,
        bg_ilm: bool = True,
        bg_csi: bool = False,
        max_grad: int = 1,
        model_config: dict = None,
        optimize: bool = True,
        compute_dtype: str = "float32",
        minpath_tie_parity: str = "exact",
    ):
        self.variables = variables

        # Shared selection (s2d U-Net / BN-folded DeepLabV3+ / parity) —
        # the staged pipeline needs probabilities per stage, so it asks
        # for the s2d probs output rather than the fused labels tail.
        # Raises if compute_dtype != float32 lands on the parity path.
        s2d_fn, fold_fn, self._forward_variables, _kind, self._s2d_div = (
            select_optimized_forward(
                module,
                variables,
                model_config,
                compute_dtype=compute_dtype,
                s2d_output="probs",
                optimize=optimize,
            )
        )
        self._predict_s2d = None
        if s2d_fn is not None:

            @jax.jit
            def _predict_s2d(images):
                x = preprocess_fn(images.astype(jnp.float32))
                return s2d_fn(x)

            self._predict_s2d = _predict_s2d
        self._fold_fn = fold_fn
        self._compute_dtype = compute_dtype

        @jax.jit
        def _predict(variables, images):
            x = preprocess_fn(images.astype(jnp.float32))
            if fold_fn is not None:
                return fold_fn(variables, x)
            return module.apply(variables, x, training=False)

        @jax.jit
        def _convert(probs):
            argmax_pred, categorical = boundary_ops.perform_argmax(probs, bin=True)
            maps = boundary_ops.boundary_maps_from_labels(
                argmax_pred, probs.shape[3], bg_ilm=bg_ilm, bg_csi=bg_csi
            )
            return argmax_pred.astype(jnp.uint8), categorical, maps

        @functools.partial(jax.jit, static_argnames=("image_height",))
        def _graph(maps, image_height):
            delins = minpath_ops.delineate_image_maps(
                maps, max_grad=max_grad, tie_parity=minpath_tie_parity
            )
            masks = boundary_ops.create_area_mask(
                delins.astype(jnp.float32), image_height
            )
            return delins.astype(jnp.uint16), masks

        self._predict_fn = _predict
        self._convert_fn = _convert
        self._graph_fn = _graph

    def predict_probs(self, images_u8):
        """(B, H, W, C) uint8 -> (B, H, W, num_classes) float probabilities."""
        images = jnp.asarray(images_u8)
        if (
            self._predict_s2d is not None
            and images.shape[1] % self._s2d_div == 0
            and images.shape[2] % self._s2d_div == 0
        ):
            return self._predict_s2d(images)
        if self._predict_s2d is not None and self._compute_dtype != "float32":
            # The geometry fallback is the float32 parity forward;
            # silently running it would misreport a bfloat16 evaluation
            # (same contract as the constructor's eligibility guard).
            raise ValueError(
                f"compute_dtype={self._compute_dtype!r} requires the s2d "
                f"fast path, but image dims {images.shape[1]}x"
                f"{images.shape[2]} do not divide its factor "
                f"{self._s2d_div}; pad the input or use "
                "compute_dtype='float32'"
            )
        return self._predict_fn(self._forward_variables, images)

    def convert(self, probs):
        """probs -> (argmax labels u8, one-hot class-first, boundary maps u8)."""
        return self._convert_fn(probs)

    def graph_search(self, maps):
        """boundary maps (B, M, H, W) -> (delineations u16 (B, M, W),
        region masks u8 (B, H, W))."""
        return self._graph_fn(maps, maps.shape[-2])


def make_fused_pipeline(
    module,
    preprocess_fn: Callable,
    bg_ilm: bool = True,
    bg_csi: bool = False,
    max_grad: int = 1,
    with_graph_search: bool = True,
    donate_images: bool = False,
    minpath_backend: str = "auto",
    minpath_tie_parity: str = "exact",
    apply_fn: Callable = None,
    labels_apply_fn: Callable = None,
    num_classes: int = None,
    return_maps: bool = True,
    mesh=None,
) -> Callable:
    """One-jit end-to-end pipeline:
    ``fn(variables, images_u8) -> (labels u8, boundary maps u8,
    delineations u16 | None)``.

    ``apply_fn(variables, preprocessed x) -> probs`` replaces
    ``module.apply`` — used for the BN-folded DeepLabV3+ forward
    (:func:`..models.deeplabv3plus.maybe_build_folded_apply`); callers
    then pass the *folded* weights as the pipeline's ``variables``
    argument (weights stay jit arguments because captured constants
    >~100 MB fail remote compile, PLAN.md).

    ``labels_apply_fn`` (preprocessed x -> uint8 argmax labels in s2d
    layout, from ``build_s2d_apply(..., output="labels_s2d")``) is the
    fast tail: softmax, argmax AND the boundary-map conversion all stay
    in the s2d domain (:func:`.boundary.boundary_maps_from_s2d_labels`),
    so the f32 probability tensor is never depth-to-spaced or re-laid-out
    (~5 ms/batch-8 at 512x1024 on v5e). Requires ``num_classes``.

    ``minpath_tie_parity`` selects the min-path tie-break mode
    (:func:`..ops.minpath.delineate`): "exact" reproduces the reference
    heap's tie-breaks bit-for-bit on all but wide multi-row plateaus;
    "fast" keeps cost-optimality with a ~4x cheaper kernel body whose
    tie choices stay inside the 0.05 px budget even on all-plateau
    worst cases (tests/test_minpath.py::
    test_flagship_scale_fast_tie_parity_budget).

    ``return_maps=False`` yields ``None`` in the maps slot: callers that
    only need labels + delineations (streaming volume inference) skip
    both the image-layout permutation of the boundary maps and their
    device->host transfer — ~13 MB/batch-8 at 512x1024, which dominates
    per-batch latency on remote-tunnel transports.

    ``mesh`` (a ``jax.sharding.Mesh`` with a single "data" axis) makes
    the pipeline data-parallel for serving: the whole chain runs inside
    ``shard_map`` with the batch axis sharded and the weights
    replicated, so each device processes ``batch/num_devices`` B-scans
    with zero collectives (the chain is embarrassingly batch-parallel —
    the TPU analog of scaling the reference's per-image predict loop
    across workers). The batch must divide the mesh size; the Pallas
    min-path kernel runs per-shard, which SPMD auto-partitioning alone
    can't express."""

    if labels_apply_fn is not None and num_classes is None:
        raise ValueError(
            "make_fused_pipeline: labels_apply_fn requires num_classes "
            "(the s2d labels carry no channel axis to infer it from)"
        )

    def pipeline(variables, images):
        x = preprocess_fn(images.astype(jnp.float32))
        if labels_apply_fn is not None:
            from .s2d_unet import d2s

            lab_s2d = labels_apply_fn(x)
            labels = d2s(lab_s2d)[..., 0]
            # One ridge pass in the s2d domain; the image / transposed
            # orientations are pure permutations of its output.
            maps_s2d = boundary_ops.boundary_maps_from_s2d_labels(
                lab_s2d,
                num_classes,
                bg_ilm=bg_ilm,
                bg_csi=bg_csi,
                transposed="s2d",
            )
            maps = (
                boundary_ops.s2d_maps_to_image(maps_s2d)
                if return_maps
                else None
            )
            if not with_graph_search:
                return labels, maps, None
            if minpath_ops.resolve_backend(minpath_backend):
                from .minpath_pallas import delineate_pallas_s2d

                delins = delineate_pallas_s2d(
                    maps_s2d,
                    max_grad=max_grad,
                    tie_parity=minpath_tie_parity,
                )
            else:
                delins = minpath_ops.delineate(
                    boundary_ops.s2d_maps_to_transposed(maps_s2d),
                    max_grad=max_grad,
                    tie_parity=minpath_tie_parity,
                    backend=minpath_backend,
                )
            return labels, maps, delins.astype(jnp.uint16)
        if apply_fn is not None:
            probs = apply_fn(variables, x)
        else:
            probs = module.apply(variables, x, training=False)
        # NB: with a probability forward, the f32 one-hot conversion
        # composes better with the Pallas min-path than
        # boundary_maps_from_labels (measured 52 vs 66 ms for the full
        # fused pipeline on v5e — an XLA scheduling/layout interaction;
        # both are <1 ms in isolation). The labels_apply_fn path above
        # avoids the tradeoff entirely.
        argmax_pred, categorical = boundary_ops.perform_argmax(probs, bin=True)
        maps = boundary_ops.boundary_prob_maps(
            categorical, bg_ilm=bg_ilm, bg_csi=bg_csi
        )
        maps_out = maps if return_maps else None
        if not with_graph_search:
            return argmax_pred.astype(jnp.uint8), maps_out, None
        delins = minpath_ops.delineate_image_maps(
            maps,
            max_grad=max_grad,
            tie_parity=minpath_tie_parity,
            backend=minpath_backend,
        )
        return (
            argmax_pred.astype(jnp.uint8),
            maps_out,
            delins.astype(jnp.uint16),
        )

    donate = (1,) if donate_images else ()
    if mesh is None:
        return jax.jit(pipeline, donate_argnums=donate)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if len(mesh.axis_names) != 1:
        raise ValueError(
            f"make_fused_pipeline expects a 1-D data mesh, got axes "
            f"{mesh.axis_names}"
        )
    axis = mesh.axis_names[0]
    batch_spec = P(axis)
    sharded = shard_map(
        pipeline,
        mesh=mesh,
        in_specs=(P(), batch_spec),
        # None slots (maps/delins toggles) are empty subtrees; their
        # spec entry is unused.
        out_specs=(batch_spec, batch_spec, batch_spec),
        # No cross-shard communication; varying-manual-axes checking
        # would reject the replicated-variables spec needlessly.
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=donate)
