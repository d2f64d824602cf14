#!/usr/bin/env python
"""Stage-level device timing of the flagship inference pipeline.

Uses the same pure-device methodology as bench.py (K iterations inside
one jit via lax.scan with a data-dependent carry) to time cumulative
prefixes of the pipeline, so per-stage costs come out by subtraction —
composition effects included.

Usage: python tools/profile_pipeline.py [stage ...]
Stages: fwd, fwd_convert, full, minpath, convert_int (probability
forward); fwd_labels, labels_convert, full_labels (labels_s2d fast
path). A ``_fast`` suffix on minpath/full/full_labels selects the
min-path kernel's tie_parity="fast" body. Default runs both paths'
cumulative prefixes.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, BATCH, NUM_CLASSES = 512, 1024, 8, 4
K = 10


def build(stage):
    tie = "exact"
    if stage.endswith("_fast"):
        stage, tie = stage[: -len("_fast")], "fast"
    from oct_image_segmentation_models_tpu.models import get_model_class
    from oct_image_segmentation_models_tpu.ops import boundary as bops
    from oct_image_segmentation_models_tpu.ops import minpath as mops
    from oct_image_segmentation_models_tpu.ops.s2d_unet import build_s2d_apply

    container = get_model_class("unet")(
        input_channels=1, num_classes=NUM_CLASSES,
        image_height=H, image_width=W, start_neurons=32,
    )
    module = container.build_model()
    preprocess = container.get_preprocess_input_fn()
    variables = module.init(
        jax.random.PRNGKey(0), np.zeros((1, H, W, 1), np.float32),
        training=False,
    )
    apply_fn = build_s2d_apply(dict(variables), container.get_config())
    labels_fn = build_s2d_apply(
        dict(variables), container.get_config(), output="labels_s2d"
    )

    if stage == "minpath":
        # time min-path alone on precomputed maps
        @jax.jit
        def loop(maps_u8):
            def body(carry, _):
                m = jnp.bitwise_xor(maps_u8, carry)
                delins = mops.delineate_image_maps(
                    m, tie_parity=tie, backend="pallas"
                )
                return carry ^ 1, delins

            carry, delins = jax.lax.scan(
                body, jnp.uint8(0), None, length=K
            )
            return carry, delins

        # build maps once on device
        rng = np.random.default_rng(0)
        images = rng.integers(0, 255, (BATCH, H, W, 1), np.uint8)
        x = preprocess(jnp.asarray(images, jnp.float32))
        probs = apply_fn(x)
        _, categorical = bops.perform_argmax(probs, bin=True)
        maps = jax.device_get(bops.boundary_prob_maps(categorical))
        return loop, jnp.asarray(maps)

    def body_fwd(images_u8, carry):
        x = preprocess(images_u8.astype(jnp.float32) + carry)
        return apply_fn(x)

    @jax.jit
    def loop(images_u8):
        def body(carry, _):
            if stage in ("fwd_labels", "labels_convert", "full_labels"):
                x = preprocess(images_u8.astype(jnp.float32) + carry)
                lab_s2d = labels_fn(x)
                if stage == "fwd_labels":
                    out = lab_s2d.sum(dtype=jnp.int32)
                else:
                    if stage == "labels_convert":
                        maps_t = bops.boundary_maps_from_s2d_labels(
                            lab_s2d, NUM_CLASSES, transposed=True
                        )
                        out = maps_t.sum(dtype=jnp.int32)
                    else:
                        from oct_image_segmentation_models_tpu.ops.minpath_pallas import (
                            delineate_pallas_s2d,
                        )

                        maps_s2d = bops.boundary_maps_from_s2d_labels(
                            lab_s2d, NUM_CLASSES, transposed="s2d"
                        )
                        out = delineate_pallas_s2d(
                            maps_s2d, tie_parity=tie
                        ).sum()
                return (carry + 1) % 2, out
            probs = body_fwd(images_u8, carry)
            if stage == "fwd":
                out = probs.sum()
            elif stage == "fwd_convert":
                _, categorical = bops.perform_argmax(probs, bin=True)
                out = bops.boundary_prob_maps(categorical).sum(
                    dtype=jnp.int32
                )
            elif stage == "convert_int":
                argmax_pred = jnp.argmax(probs, axis=3)
                out = bops.boundary_maps_from_labels(
                    argmax_pred, NUM_CLASSES
                ).sum(dtype=jnp.int32)
            elif stage == "full":
                _, categorical = bops.perform_argmax(probs, bin=True)
                maps = bops.boundary_prob_maps(categorical)
                out = mops.delineate_image_maps(
                    maps, tie_parity=tie, backend="pallas"
                ).sum()
            else:
                raise ValueError(stage)
            return (carry + 1) % 2, out

        carry, out = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return carry, out

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (BATCH, H, W, 1), np.uint8)
    return loop, jnp.asarray(images)


def main():
    stages = sys.argv[1:] or [
        "fwd",
        "fwd_convert",
        "full",
        "minpath",
        "fwd_labels",
        "labels_convert",
        "full_labels",
    ]
    for stage in stages:
        loop, arg = build(stage)
        out = loop(arg)
        np.asarray(out[0])
        t0 = time.perf_counter()
        out = loop(arg)
        np.asarray(out[0])
        dt = time.perf_counter() - t0
        print(f"{stage:14s} {dt / K * 1e3:8.2f} ms/iter (batch {BATCH})")


if __name__ == "__main__":
    main()
