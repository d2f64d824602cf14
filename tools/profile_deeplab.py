#!/usr/bin/env python
"""A/B the DeepLabV3+ inference variants at flagship scale on device.

Variants (all one jit, K iterations via lax.scan with a data-dependent
carry, results forced with np.asarray — the only reliable timing method
over the axon tunnel, see PLAN.md):

  parity       plain Flax forward, eval-mode BatchNorm (f32)
  folded       BN folded into the convs (maybe_build_folded_apply, f32)
  folded_bf16  BN folded + bfloat16 conv stack (head/softmax f32)

The first variant is re-timed at the end ("parity#2") so session drift
is visible inside the run; never compare numbers across runs.

Usage: python tools/profile_deeplab.py [batch [K]]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, NUM_CLASSES = 512, 1024, 4


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from oct_image_segmentation_models_tpu.models import get_model_class
    from oct_image_segmentation_models_tpu.models.deeplabv3plus import (
        maybe_build_folded_apply,
    )

    container = get_model_class("deeplabv3plus")(
        input_channels=3, num_classes=NUM_CLASSES,
        image_height=H, image_width=W,
    )
    module = container.build_model()
    preprocess = container.get_preprocess_input_fn()
    variables = module.init(
        jax.random.PRNGKey(0), np.zeros((1, H, W, 3), np.float32),
        training=False,
    )

    def parity_apply(v, x):
        return module.apply(v, x, training=False)

    # Weights always travel as jit arguments: the folded backbone is
    # ~108 MB f32 and captured constants >~100 MB fail remote compile
    # (HTTP 413, PLAN.md).
    fold_fn, folded_vars = maybe_build_folded_apply(module, dict(variables))
    fold16_fn, folded16_vars = maybe_build_folded_apply(
        module, dict(variables), dtype=jnp.bfloat16
    )
    variants = [
        ("parity", parity_apply, variables),
        ("folded", fold_fn, folded_vars),
        ("folded_bf16", fold16_fn, folded16_vars),
    ]

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (batch, H, W, 3), np.uint8)
    )

    def make_loop(apply_fn):
        @jax.jit
        def loop(v, images_u8):
            def body(carry, _):
                x = preprocess(images_u8.astype(jnp.float32) + carry)
                probs = apply_fn(v, x)
                return (carry + 1) % 2, probs.sum()

            return jax.lax.scan(body, jnp.float32(0), None, length=k)

        return loop

    results = {}
    for name, apply_fn, v in variants + [("parity#2", parity_apply, variables)]:
        loop = make_loop(apply_fn)
        np.asarray(loop(v, images)[0])  # compile + warm
        t0 = time.perf_counter()
        np.asarray(loop(v, images)[0])
        dt = (time.perf_counter() - t0) / k
        results[name] = dt
        print(
            f"{name:12s} {dt * 1e3:8.2f} ms/iter "
            f"({batch / dt:7.1f} B-scans/s)",
            flush=True,
        )

    base = results["parity"]
    for name, dt in results.items():
        if name != "parity":
            print(f"{name:12s} speedup vs parity: {base / dt:5.2f}x")


if __name__ == "__main__":
    main()
