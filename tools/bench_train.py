#!/usr/bin/env python
"""Training-throughput benchmark (BASELINE config #3).

Measures steady-state train B-scans/s for the flagship workload — U-Net
(32 base filters) at (8, 512, 1024), focal_dice loss, bfloat16 compute,
s2d-transformed differentiable forward (the `train_forward_impl="auto"`
default for eligible U-Nets) — as N REAL train-step dispatches (grads +
optimizer update + BN stats), i.e. exactly what the training loop pays
per step, including the per-dispatch host round trip.

The ``vs_baseline`` denominator mirrors bench.py's inference
methodology: the UPSTREAM package's own Keras ``model.fit`` on this
host's CPU (reference `training/training.py:401-407`), cache-keyed on
the methodology + constants + measurement source in the same
``.bench_cpu_baseline.json`` (idle-box contention guard included; a
contended measurement is used but never cached). The reference side
compiles ``bce_dice_loss`` — its registered Dice+CE combination
(`common/custom_losses.py:85-91`) — because its ``focal_dice_loss``
needs the uninstallable ``focal-loss`` package; at this scale the loss
is negligible against the conv stack on both sides, and the CPU side
runs batch 1 (its throughput is batch-size-flat on this compute-bound
host, and batch-8 steps would take ~20 min each).

Prints ONE JSON line, same shape as bench.py's.

Usage: python tools/bench_train.py          (from the repo root)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: shared baseline machinery)

H, W, BATCH, NUM_CLASSES = 512, 1024, 8, 4
N_STEPS = 10
TRAIN_BASELINE_VERSION = 1
REF_FIT_SAMPLES = 3  # batch-1 steps per epoch on the CPU side


def measure_tpu_train(
    h=H,
    w=W,
    batch=BATCH,
    num_classes=NUM_CLASSES,
    n_steps=N_STEPS,
    start_neurons=32,
    dtype="bfloat16",
):
    """Steady-state train B-scans/s on the default device: 1 warmup
    (compile) step + ``n_steps`` timed real dispatches."""
    import jax

    from oct_image_segmentation_models_tpu.models import get_model_class
    from oct_image_segmentation_models_tpu.ops import losses, metrics
    from oct_image_segmentation_models_tpu.ops.s2d_train import (
        maybe_build_s2d_train,
    )
    from oct_image_segmentation_models_tpu.parallel.mesh import create_mesh
    from oct_image_segmentation_models_tpu.parallel.train_step import (
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    container = get_model_class("unet")(
        input_channels=1,
        num_classes=num_classes,
        image_height=h,
        image_width=w,
        start_neurons=start_neurons,
        dtype=dtype,
    )
    module = container.build_model()
    variables = module.init(
        jax.random.PRNGKey(0),
        np.zeros((1, h, w, 1), np.float32),
        training=False,
    )
    compute_module = (
        maybe_build_s2d_train(module, container.get_config(), h, w) or module
    )

    loss_fn = losses.custom_loss_objects["focal_dice_loss"]["function"](
        num_classes=num_classes, is_y_true_sparse=True
    )
    metric_fn = metrics.dice_coef_macro(True, num_classes)
    mesh = create_mesh(jax.devices()[:1])
    tx = build_optimizer("adam", {"learning_rate": 1e-3})
    state = create_train_state(dict(variables), tx, mesh)
    train_step = make_train_step(compute_module, tx, loss_fn, metric_fn, mesh)

    rng = np.random.default_rng(0)
    images = rng.random((batch, h, w, 1)).astype(np.float32)
    labels = rng.integers(0, num_classes, (batch, h, w, 1)).astype(np.float32)
    images = jax.device_put(images, mesh.devices.reshape(-1)[0])
    labels = jax.device_put(labels, mesh.devices.reshape(-1)[0])

    import jax.random as jrandom

    # TWO warmup steps: the first compiles for the fresh
    # create_train_state signature; the second recompiles once more for
    # the jit-output state's layouts/shardings (donated buffers come
    # back with compiler-chosen layouts — measured ~30 s one-time on the
    # remote compiler, then ~0.15 s/step steady; timing from the first
    # post-compile step silently averages the recompile in, which is
    # how an early version of this tool read 20x slow).
    print("bench_train: compiling train step...", file=sys.stderr, flush=True)
    state, loss, _ = train_step(state, images, labels, jrandom.PRNGKey(0))
    float(loss)  # compile #1 + drain
    state, loss, _ = train_step(state, images, labels, jrandom.PRNGKey(1))
    float(loss)  # compile #2 (output-layout signature) + drain
    print(
        f"bench_train: compiled; timing {n_steps} steps...",
        file=sys.stderr,
        flush=True,
    )
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss, _ = train_step(
            state, images, labels, jrandom.PRNGKey(i + 2)
        )
    float(loss)  # drain the async chain
    dt = time.perf_counter() - t0
    return batch * n_steps / dt


def _train_baseline_key():
    import hashlib
    import inspect

    digest = hashlib.md5()
    digest.update(
        f"train-v{TRAIN_BASELINE_VERSION} {H}x{W} c{NUM_CLASSES} "
        f"n{REF_FIT_SAMPLES} start_neurons32".encode()
    )
    digest.update(inspect.getsource(measure_reference_train_keras_cpu).encode())
    return digest.hexdigest()


def measure_reference_train_keras_cpu():
    """Upstream ``model.fit`` steady-state B-scans/s on this CPU.

    Builds the reference's own U-Net (`models/unet.py:106-153`),
    compiles it with its ``bce_dice_loss`` and Adam — the shape of
    `training/training.py:190-266` — and times per-batch ``fit`` steps
    (batch 1, first batch dropped as trace/oneDNN warmup). Cached under
    the methodology key; contended measurements are never cached.
    Returns B-scans/s or nan.
    """
    key = _train_baseline_key()
    cached = bench._read_cache()
    if cached.get("train_reference_baseline_key") == key:
        return cached["train_reference_keras_cpu_bscans_per_s"]

    imported = bench._import_reference_predict_path()
    if imported is None:
        return float("nan")
    get_model_class, _ref_utils, _ref_gs = imported
    # common.utils imported custom_losses on the reference side; reuse it
    ref_losses = sys.modules.get(
        "oct_image_segmentation_models.common.custom_losses"
    )
    if ref_losses is None:
        return float("nan")

    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = 0.0
    cpus = os.cpu_count() or 1
    contended = load1 > 0.75 * cpus
    if contended:
        print(
            f"bench_train: WARNING — measuring the reference Keras-CPU "
            f"train baseline under CPU contention (load {load1:.2f} on "
            f"{cpus} CPU(s)); this run's number is deflated and will NOT "
            "be cached — re-run on an idle box.",
            file=sys.stderr,
            flush=True,
        )

    try:
        import tensorflow as tf
        from tensorflow import keras

        container = get_model_class("unet")(
            input_channels=1,
            num_classes=NUM_CLASSES,
            image_height=H,
            image_width=W,
            start_neurons=32,
        )
        model = container.build_model()
        loss_fn = ref_losses.custom_loss_objects["bce_dice_loss"]["function"](
            num_classes=NUM_CLASSES
        )
        model.compile(optimizer=keras.optimizers.Adam(1e-3), loss=loss_fn)

        rng = np.random.default_rng(0)
        x = rng.random((REF_FIT_SAMPLES, H, W, 1)).astype(np.float32)
        labels = rng.integers(0, NUM_CLASSES, (REF_FIT_SAMPLES, H, W))
        y = keras.utils.to_categorical(labels, NUM_CLASSES).astype(np.float32)

        batch_times = []

        class _BatchTimer(keras.callbacks.Callback):
            def on_train_batch_begin(self, b, logs=None):
                self._t0 = time.perf_counter()

            def on_train_batch_end(self, b, logs=None):
                batch_times.append(time.perf_counter() - self._t0)

        model.fit(
            x,
            y,
            batch_size=1,
            epochs=1,
            shuffle=False,
            verbose=0,
            callbacks=[_BatchTimer()],
        )
        del tf
        steady = batch_times[1:]  # batch 0 pays tracing + autotuning
        tp = 1.0 / (sum(steady) / len(steady))
    except Exception as exc:  # noqa: BLE001 — diagnosable nan beats a crash
        print(
            f"bench_train: reference Keras-CPU train baseline failed "
            f"({exc!r})",
            file=sys.stderr,
            flush=True,
        )
        return float("nan")

    if not contended:
        bench._update_cache(
            {
                "train_reference_keras_cpu_bscans_per_s": tp,
                "train_reference_baseline_key": key,
            }
        )
    return tp


def main():
    wait_s = float(os.environ.get("BENCH_TUNNEL_WAIT_S", "2400"))
    if wait_s > 0 and bench.wait_for_accelerator(max_wait_s=wait_s) == "hang":
        print(
            "bench_train: accelerator unreachable (tunnel outage); aborting",
            file=sys.stderr,
            flush=True,
        )
        sys.exit(1)
    import jax

    device = jax.devices()[0]
    print(f"bench_train: device {device}", file=sys.stderr, flush=True)
    tp_accel = measure_tpu_train()
    print(
        f"bench_train: TPU {tp_accel:.2f} B-scans/s; measuring the "
        "reference Keras-CPU fit baseline...",
        file=sys.stderr,
        flush=True,
    )
    if os.environ.get("BENCH_TRAIN_SKIP_REF", "0") == "1":
        # TPU-phase-only run (e.g. while the box is otherwise busy and
        # the CPU denominator could not be cached anyway).
        tp_ref = float("nan")
    else:
        tp_ref = measure_reference_train_keras_cpu()
    baseline = 10.0 * tp_ref
    vs_baseline = tp_accel / baseline if np.isfinite(baseline) else None

    print(
        json.dumps(
            {
                "metric": "train B-scans/sec/chip (512x1024 batch-8 U-Net "
                "fwd+bwd+update, focal_dice, bf16 s2d forward)",
                "value": round(tp_accel, 3),
                "unit": "B-scans/s",
                "vs_baseline": (
                    round(vs_baseline, 3) if vs_baseline is not None else None
                ),
                "detail": {
                    "device": str(device),
                    "reference_keras_cpu_train_bscans_per_s": (
                        round(tp_ref, 5) if np.isfinite(tp_ref) else None
                    ),
                    "baseline_definition": "10x reference Keras-CPU "
                    "(upstream package's own model.fit with its "
                    "bce_dice_loss, batch 1, steady-state step on this "
                    "host's CPU)",
                    "timing": f"{N_STEPS} real train-step dispatches "
                    "after 2 compile/warmup steps (includes per-dispatch "
                    "host round trip, like the real training loop)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
