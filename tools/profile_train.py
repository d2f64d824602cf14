#!/usr/bin/env python
"""Stage-level timing of the flagship TRAIN step (batch 8, 512x1024,
s2d forward, focal_dice).

Stages: fwd (loss value only) and fwdbwd (value_and_grad) use the
K-in-one-jit methodology of tools/profile_pipeline.py — pure device
time. The step stage deliberately times K SEPARATE make_train_step
dispatches (grads + single-device update + BN stats), i.e. exactly what
the real training loop pays per step INCLUDING the per-dispatch tunnel
RTT (~25-45 ms here) — compare it against fwdbwd to read off the
dispatch + optimizer overhead. A ``_parity`` suffix uses the plain Flax
module instead of the s2d transform.

A ``_deeplab`` suffix profiles DeepLabV3+ instead (plain Flax module —
no s2d transform applies to its stride-4 stem; bfloat16 compute dtype
like the U-Net default); ``_deeplab_f32`` uses float32.

Usage: python tools/profile_train.py [stage ...]
  e.g. fwd fwdbwd step fwdbwd_parity fwdbwd_deeplab fwdbwd_deeplab_f32
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
    dtype = "bfloat16"
    if stage.endswith("_f32"):
        dtype = "float32"
        stage = stage[: -len("_f32")]
    deeplab = stage.endswith("_deeplab")
    if deeplab:
        stage = stage[: -len("_deeplab")]
    parity = stage.endswith("_parity")
    if parity:
        stage = stage[: -len("_parity")]

    from oct_image_segmentation_models_tpu.models import get_model_class
    from oct_image_segmentation_models_tpu.ops import losses
    from oct_image_segmentation_models_tpu.ops.s2d_train import (
        maybe_build_s2d_train,
    )
    from oct_image_segmentation_models_tpu.ops import metrics
    from oct_image_segmentation_models_tpu.parallel.mesh import create_mesh
    from oct_image_segmentation_models_tpu.parallel.train_step import (
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    in_ch = 3 if deeplab else 1
    if deeplab:
        container = get_model_class("deeplabv3plus")(
            input_channels=3,
            num_classes=NUM_CLASSES,
            image_height=H,
            image_width=W,
            dtype=dtype,
        )
    else:
        container = get_model_class("unet")(
            input_channels=1,
            num_classes=NUM_CLASSES,
            image_height=H,
            image_width=W,
            start_neurons=32,
            dtype=dtype,
        )
    module = container.build_model()
    variables = module.init(
        jax.random.PRNGKey(0), np.zeros((1, H, W, in_ch), np.float32),
        training=False,
    )
    compute_module = module
    if not (parity or deeplab):
        s2d = maybe_build_s2d_train(module, container.get_config(), H, W)
        assert s2d is not None
        compute_module = s2d

    loss_fn = losses.custom_loss_objects["focal_dice_loss"]["function"](
        num_classes=NUM_CLASSES, is_y_true_sparse=True
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.random((BATCH, H, W, in_ch)).astype(np.float32)
    )
    labels = jnp.asarray(
        rng.integers(0, NUM_CLASSES, (BATCH, H, W, 1)).astype(np.float32)
    )

    if stage == "step":
        mesh = create_mesh(jax.devices()[:1])
        tx = build_optimizer("adam", {"learning_rate": 1e-3})
        state = create_train_state(dict(variables), tx, mesh)
        metric_fn = metrics.dice_coef_macro(True, NUM_CLASSES)
        train_step = make_train_step(
            compute_module, tx, loss_fn, metric_fn, mesh
        )

        def run():
            s = state
            t0 = None
            for i in range(K + 1):
                s, loss, metric = train_step(
                    s, images, labels, jax.random.PRNGKey(i)
                )
                if i == 0:
                    float(loss)  # compile + drain
                    t0 = time.perf_counter()
            float(loss)
            return (time.perf_counter() - t0) / K

        return run

    def loss_of(params, bs, im, r):
        out, _ = compute_module.apply(
            {"params": params, "batch_stats": bs},
            im,
            training=True,
            rngs={"dropout": r},
            mutable=["batch_stats"],
        )
        return loss_fn(labels, out)

    if stage == "fwd":
        fn = loss_of
    elif stage == "fwdbwd":
        fn = jax.value_and_grad(loss_of)
    else:
        raise ValueError(stage)

    @jax.jit
    def loop(params, bs, im):
        def body(carry, _):
            out = fn(params, bs, im + carry, jax.random.PRNGKey(0))
            if stage == "fwdbwd":
                loss, grads = out
                # fold every grad leaf into the carry so XLA cannot
                # dead-code-eliminate the backward pass
                gsum = sum(
                    g.sum(dtype=jnp.float32)
                    for g in jax.tree_util.tree_leaves(grads)
                )
                # (1e-30, not 0.0: XLA folds x*0 and would DCE again)
                lead = loss + 1e-30 * gsum
            else:
                lead = out
            return carry + 1e-6, lead

        carry, losses_ = jax.lax.scan(
            body, jnp.float32(0), None, length=K
        )
        return carry, losses_

    params = variables["params"]
    bs = variables["batch_stats"]

    def run():
        out = loop(params, bs, images)
        np.asarray(out[0])
        t0 = time.perf_counter()
        out = loop(params, bs, images)
        np.asarray(out[0])
        return (time.perf_counter() - t0) / K

    return run


def main():
    stages = sys.argv[1:] or ["fwd", "fwdbwd", "step"]
    for stage in stages:
        run = build(stage)
        dt = run()
        print(f"{stage:14s} {dt * 1e3:8.2f} ms/iter (batch {BATCH})")


if __name__ == "__main__":
    main()
