"""Streaming OCT-volume inference: fused conv -> softmax -> boundary-map ->
min-path pipeline over a whole volume of B-scans, double-buffered.

BASELINE.md config #5. The volume (e.g. 512 B-scans) is processed in
device-sized batches through the single-jit fused pipeline
(:func:`..ops.inference.make_fused_pipeline`); host->device uploads of the
next batch overlap compute on the current one via JAX async dispatch
(:func:`..parallel.input_pipeline.device_prefetch`), so HBM sees a steady
stream and the MXU never idles on transfers.
"""

from __future__ import annotations

import numpy as np

from ..models import get_model_class
from ..ops.inference import make_fused_pipeline
from ..parallel.input_pipeline import device_prefetch


class VolumeSegmenter:
    """Reusable fused-pipeline runner for fixed-size B-scans."""

    def __init__(
        self,
        loaded_model,
        model_config: dict,
        batch_size: int = 8,
        bg_ilm: bool = True,
        bg_csi: bool = False,
        max_grad: int = 1,
        with_graph_search: bool = True,
        optimize: bool = True,
        compute_dtype: str = "float32",
        # "fast" = production min-path mode, inside the 0.05 px parity
        # budget; "exact" = reference-heap bit parity (see
        # prediction_parameters.py for the rationale).
        minpath_tie_parity: str = "fast",
        mesh=None,
    ):
        self.loaded_model = loaded_model
        self.batch_size = batch_size
        # Data-parallel serving: the fused pipeline runs inside
        # shard_map over the mesh's "data" axis, each device taking
        # batch/num_devices B-scans (see make_fused_pipeline). batch
        # must split evenly across devices.
        #
        # Multi-controller runtimes (jax.process_count() > 1): every
        # process calls segment_volume with the SAME full volume; each
        # segments a contiguous per-process slice on its OWN devices
        # (the pipeline runs over a process-LOCAL mesh, so the hot loop
        # has no cross-host collectives — B-scans are independent), and
        # the outputs are all-gathered host-side afterwards so every
        # process returns full-volume results identical to a
        # single-process run. batch_size is per-process in this mode.
        self._multiproc = False
        if mesh is not None:
            import jax

            if jax.process_count() > 1:
                local = [
                    d
                    for d in mesh.devices.flat
                    if d.process_index == jax.process_index()
                ]
                if not local:
                    raise ValueError(
                        "VolumeSegmenter mesh holds no devices for "
                        f"process {jax.process_index()}; every process "
                        "must own a slice of the serving mesh"
                    )
                from ..parallel.mesh import create_mesh

                mesh = create_mesh(local)
                self._multiproc = True
        self.mesh = mesh
        if mesh is not None and batch_size % mesh.devices.size:
            raise ValueError(
                f"batch_size={batch_size} must be a multiple of the "
                f"{'per-process ' if self._multiproc else ''}mesh size "
                f"({mesh.devices.size}) for data-parallel inference"
            )
        container = get_model_class(loaded_model.name)(**model_config)
        # Divisibility requirement of the conv stack, taken from the
        # container (which has normalized config defaults applied).
        self._model_div = container.spatial_divisor

        # s2d-transformed conv stack for eligible U-Nets (volumes have
        # fixed B-scan geometry, checked at segment time). The fast path
        # keeps softmax/argmax/boundary-ridge in the s2d domain
        # (build_s2d_apply output="labels_s2d", see ops/inference.py).
        # ``compute_dtype="bfloat16"`` additionally halves the conv
        # stack's HBM traffic (head/softmax stay float32); boundary rows
        # shift only where class probabilities are near-tied — see
        # tests/test_s2d_unet.py for the accuracy-tolerance check.
        from ..ops.inference import select_optimized_forward

        # s2d U-Net labels path, or BN-folded DeepLabV3+ (whose folded
        # weights become the pipeline's variables argument — not jit
        # constants, see make_fused_pipeline); compute_dtype honored on
        # the conv stack/backbone (head stays f32). The selector raises
        # when compute_dtype != float32 lands on the parity path.
        labels_fn, apply_fn, forward_variables, _kind, _s2d_div = (
            select_optimized_forward(
                loaded_model.module,
                loaded_model.variables,
                model_config,
                compute_dtype=compute_dtype,
                optimize=optimize,
            )
        )

        self._forward_variables = forward_variables
        # No geometry fallback pipeline: any dims passing the
        # 2**pool_layers validation below also divide the s2d factor
        # (s2d levels <= pool_layers), so the fast path always applies.
        self._pipeline = make_fused_pipeline(
            loaded_model.module,
            container.get_preprocess_input_fn(),
            bg_ilm=bg_ilm,
            bg_csi=bg_csi,
            max_grad=max_grad,
            with_graph_search=with_graph_search,
            minpath_tie_parity=minpath_tie_parity,
            mesh=mesh,
            apply_fn=apply_fn,
            labels_apply_fn=labels_fn,
            num_classes=loaded_model.output_classes,
            # Volume segmentation only consumes labels + delineations;
            # skipping the maps output drops an image-layout permutation
            # and ~13 MB/batch-8 of device->host traffic.
            return_maps=False,
        )

    def segment_volume(self, volume: np.ndarray, prefetch: int = 2):
        """Segment a ``(num_bscans, H, W, C)`` uint8 volume.

        Returns ``(labels u8 (N, H, W), boundary rows u16 (N, M, W))``.

        Under a multi-process runtime every process passes the SAME
        volume and receives the same full-volume outputs (per-process
        contiguous slices segmented locally, host all-gather at the
        end).
        """
        n = volume.shape[0]
        if n == 0:
            raise ValueError(
                "segment_volume requires at least one B-scan "
                "(got an empty volume)"
            )
        if self._multiproc:
            return self._segment_volume_multiproc(volume, prefetch)
        return self._segment_local(volume, prefetch)

    def _segment_volume_multiproc(self, volume: np.ndarray, prefetch: int):
        import jax
        from jax.experimental import multihost_utils

        n = volume.shape[0]
        nprocs, pid = jax.process_count(), jax.process_index()
        # Equal-size chunks (last process may pad with repeats of the
        # final B-scan) so the all-gathered outputs stack rectangularly.
        chunk = -(-n // nprocs)
        lo = min(pid * chunk, n)
        local = volume[lo : lo + chunk]
        if local.shape[0] < chunk:
            filler = np.repeat(volume[-1:], chunk - local.shape[0], axis=0)
            local = (
                np.concatenate([local, filler]) if local.size else filler
            )
        labels, segs = self._segment_local(local, prefetch)
        # Host-side gather over all processes: (nprocs, chunk, ...) ->
        # (nprocs * chunk, ...) -> trim the tail padding.
        labels = multihost_utils.process_allgather(labels)
        labels = labels.reshape((-1,) + labels.shape[2:])[:n]
        if segs is not None:
            segs = multihost_utils.process_allgather(segs)
            segs = segs.reshape((-1,) + segs.shape[2:])[:n]
        return labels, segs

    def _segment_local(self, volume: np.ndarray, prefetch: int = 2):
        n = volume.shape[0]
        b = self.batch_size
        pad = (-n) % b
        if pad:
            volume = np.concatenate([volume, volume[-1:].repeat(pad, 0)])

        # The conv stack downsamples 2**pool_layers times; incompatible
        # dims would otherwise surface as an opaque concat shape error
        # deep inside the traced forward.
        model_div = self._model_div
        if volume.shape[1] % model_div or volume.shape[2] % model_div:
            raise ValueError(
                f"B-scan spatial dims {volume.shape[1]}x{volume.shape[2]} "
                f"must be multiples of {model_div} (the model's "
                f"spatial downsampling factor)"
            )

        pipeline = self._pipeline
        batches = (volume[i : i + b] for i in range(0, len(volume), b))
        if self.mesh is not None:
            from ..parallel.input_pipeline import prefetch_to_mesh

            batch_iter = prefetch_to_mesh(
                batches, self.mesh, size=prefetch
            )
        else:
            batch_iter = device_prefetch(batches, size=prefetch)
        labels_out, segs_out = [], []
        for batch in batch_iter:
            labels, _maps, delins = pipeline(self._forward_variables, batch)
            labels_out.append(labels)
            if delins is not None:
                segs_out.append(delins)

        labels = np.concatenate([np.asarray(x) for x in labels_out])[:n]
        segs = (
            np.concatenate([np.asarray(x) for x in segs_out])[:n]
            if segs_out
            else None
        )
        return labels, segs
