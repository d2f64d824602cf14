"""Ahead-of-time deployment artifacts for the inference pipeline.

Serializes the full fused segmentation chain — preprocess -> model
forward -> softmax/argmax -> boundary maps -> min-path delineation
(:func:`..ops.inference.make_fused_pipeline`) — to a self-contained
StableHLO artifact via ``jax.export``, with the trained weights embedded
as constants. The artifact runs with NO model source, Flax modules, or
checkpoint files at serving time: ``load_exported_pipeline`` needs only
jax and the bytes.

This is a beyond-reference capability: the reference ships Keras HDF5
checkpoints (`common/utils.py:26-70`) that require the full TF/Keras
stack plus the package's model classes to serve. A StableHLO artifact is
the TPU-native deployment unit — versioned, hermetic, and loadable on
any jax platform the artifact was lowered for.

The exported chain pins ``minpath_backend="xla"`` (the pure-XLA DP scan,
bit-identical to the Pallas kernel's "exact" mode on supported maps): a
serialized Pallas custom call would tie the artifact to one TPU
generation and be rejected by ``jax.export``'s portability checks,
while the XLA path is plain StableHLO and can target several platforms
in one artifact (default cpu+tpu).

Container format: HDF5 (the framework's idiom) with one ``stablehlo``
byte dataset and a JSON metadata attribute (format version, model
name/config, input spec, pipeline flags).
"""

from __future__ import annotations

import json
from pathlib import Path

import h5py
import numpy as np

EXPORT_FORMAT_VERSION = 1

_METADATA_KEY = "octseg_export"


def export_inference_pipeline(
    model_path,
    out_path,
    *,
    image_height: int = None,
    image_width: int = None,
    batch_size: int = 8,
    with_graph_search: bool = True,
    return_maps: bool = True,
    bg_ilm: bool = True,
    bg_csi: bool = False,
    max_grad: int = 1,
    # "fast" = production default across the workflow surfaces (<0.05 px
    # budget); "exact" = reference-heap bit parity.
    minpath_tie_parity: str = "fast",
    optimize: bool = True,
    compute_dtype: str = "float32",
    platforms=("cpu", "tpu"),
    mlflow_tracking_uri=None,
    mlflow_run_uuid=None,
) -> Path:
    """Export a trained model's fused inference pipeline to ``out_path``.

    ``image_height``/``image_width`` default to the geometry recorded in
    the model config. ``optimize=True`` exports the s2d-transformed conv
    stack for eligible U-Nets (or the BN-folded DeepLabV3+ forward) —
    the same fast paths :class:`..prediction.streaming.VolumeSegmenter`
    serves. ``batch_size=None`` lowers with a SYMBOLIC batch dimension
    (``jax.export.symbolic_args_specs``): one artifact then serves any
    batch size, at the cost of shape-specialized compilation happening
    at serving time per distinct batch. Returns the written path.
    """
    import jax
    import jax.numpy as jnp

    from ..models import get_model_class
    from ..ops.inference import make_fused_pipeline
    from .model_io import load_model_and_config

    loaded, model_config = load_model_and_config(
        model_path,
        mlflow_tracking_uri=mlflow_tracking_uri,
        mlflow_run_uuid=mlflow_run_uuid,
    )
    height = image_height or model_config.get("image_height")
    width = image_width or model_config.get("image_width")
    channels = model_config.get("input_channels", 1)
    # Geometry must be resolved BEFORE the container is constructed: the
    # model classes require image_height/image_width, so a config with
    # no recorded geometry would otherwise die in a TypeError ahead of
    # this guidance (and the caller's explicit dims would never apply).
    if not height or not width:
        raise ValueError(
            "image_height/image_width must be given when the model config "
            "records no geometry"
        )
    container = get_model_class(loaded.name)(
        **{**model_config, "image_height": height, "image_width": width}
    )
    model_div = container.spatial_divisor
    if height % model_div or width % model_div:
        raise ValueError(
            f"export geometry {height}x{width} must be a multiple of "
            f"{model_div} (the model's spatial downsampling factor)"
        )

    from ..ops.inference import select_optimized_forward

    # Shared fast-path selection (raises when compute_dtype != float32
    # would land on the always-float32 parity forward).
    labels_fn, apply_fn, forward_variables, kind, _s2d_div = (
        select_optimized_forward(
            loaded.module,
            loaded.variables,
            model_config,
            compute_dtype=compute_dtype,
            optimize=optimize,
        )
    )

    pipeline = make_fused_pipeline(
        loaded.module,
        container.get_preprocess_input_fn(),
        bg_ilm=bg_ilm,
        bg_csi=bg_csi,
        max_grad=max_grad,
        with_graph_search=with_graph_search,
        return_maps=return_maps,
        minpath_backend="xla",
        minpath_tie_parity=minpath_tie_parity,
        apply_fn=apply_fn,
        labels_apply_fn=labels_fn,
        num_classes=loaded.output_classes,
    )

    # Weights close over the traced function -> embedded as StableHLO
    # constants: the artifact is self-contained. (The >~100 MB captured-
    # constant limit documented in PLAN.md is a REMOTE-COMPILE transport
    # bound; export only lowers locally and never compiles.)
    host_variables = jax.device_get(forward_variables)

    def run(images_u8):
        return pipeline(host_variables, images_u8)

    if batch_size is None:
        abstract = jax.ShapeDtypeStruct((1, height, width, channels), jnp.uint8)
        (spec,) = jax.export.symbolic_args_specs(
            (abstract,), f"b, {height}, {width}, {channels}"
        )
    else:
        spec = jax.ShapeDtypeStruct(
            (batch_size, height, width, channels), jnp.uint8
        )
    exported = jax.export.export(jax.jit(run), platforms=list(platforms))(
        spec
    )
    blob = exported.serialize()

    metadata = {
        "format_version": EXPORT_FORMAT_VERSION,
        "model_name": loaded.name,
        "model_config": model_config,
        "input_shape": [batch_size, height, width, channels],
        "input_dtype": "uint8",
        "platforms": list(platforms),
        "with_graph_search": with_graph_search,
        "return_maps": return_maps,
        "bg_ilm": bg_ilm,
        "bg_csi": bg_csi,
        "max_grad": max_grad,
        "minpath_tie_parity": minpath_tie_parity,
        "optimized_forward": kind,
        "compute_dtype": compute_dtype,
        "jax_version": jax.__version__,
    }
    out_path = Path(out_path)
    with h5py.File(out_path, "w") as fh:
        fh.create_dataset(
            "stablehlo", data=np.frombuffer(blob, dtype=np.uint8)
        )
        fh.attrs[_METADATA_KEY] = json.dumps(metadata)
    return out_path


class ExportedPipeline:
    """A deserialized deployment artifact.

    Calling it with a ``(B, H, W, C)`` uint8 batch (the exact exported
    shape) returns ``(labels u8, boundary maps u8 | None,
    delineations u16 | None)`` — the :func:`make_fused_pipeline`
    contract. ``metadata`` carries the export-time record.
    """

    def __init__(self, exported, metadata: dict):
        import jax

        self.metadata = metadata
        self._exported = exported
        self._call = jax.jit(exported.call)

    @property
    def input_shape(self):
        return tuple(self.metadata["input_shape"])

    def __call__(self, images_u8):
        images_u8 = np.asarray(images_u8)
        expected = self.input_shape
        got = images_u8.shape
        fixed_ok = got == expected
        # symbolic-batch artifacts record a null batch entry: any
        # batch >= 1 with the exported geometry is valid
        symbolic_ok = (
            expected[0] is None
            and len(got) == len(expected)
            and got[0] >= 1
            and got[1:] == expected[1:]
        )
        if not (fixed_ok or symbolic_ok):
            raise ValueError(
                f"exported pipeline was lowered for input shape "
                f"{expected}, got {got}; re-export with the desired "
                "batch/geometry"
            )
        if images_u8.dtype != np.uint8:
            # The artifact embeds the preprocessing (x/255 etc.) — it
            # consumes RAW uint8 pixels. A silent astype(uint8) would
            # truncate already-normalized float images to all zeros, so
            # only losslessly-representable integer inputs are accepted.
            if not np.issubdtype(images_u8.dtype, np.integer):
                raise ValueError(
                    f"exported pipeline takes raw uint8 images (it "
                    f"applies the model's preprocessing itself), got "
                    f"dtype {images_u8.dtype}; pass the unnormalized "
                    "pixel values"
                )
            if images_u8.min() < 0 or images_u8.max() > 255:
                raise ValueError(
                    f"integer image values outside [0, 255] "
                    f"(min {images_u8.min()}, max {images_u8.max()}) "
                    "cannot be represented as uint8 pixels"
                )
        # copy=False: an already-uint8 batch (the documented contract)
        # passes through without a full host-side copy.
        return self._call(images_u8.astype(np.uint8, copy=False))


def load_exported_pipeline(path) -> ExportedPipeline:
    """Load an artifact written by :func:`export_inference_pipeline`."""
    import jax

    with h5py.File(path, "r") as fh:
        if _METADATA_KEY not in fh.attrs or "stablehlo" not in fh:
            raise ValueError(
                f"{path} is not an octseg export artifact (missing "
                f"{_METADATA_KEY!r} metadata or 'stablehlo' payload)"
            )
        metadata = json.loads(fh.attrs[_METADATA_KEY])
        blob = bytes(np.asarray(fh["stablehlo"]).tobytes())
    version = metadata.get("format_version")
    if version != EXPORT_FORMAT_VERSION:
        raise ValueError(
            f"unsupported export format version {version} "
            f"(this build reads version {EXPORT_FORMAT_VERSION})"
        )
    exported = jax.export.deserialize(bytearray(blob))
    return ExportedPipeline(exported, metadata)
