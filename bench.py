#!/usr/bin/env python
"""Headline benchmark: B-scans/sec on one chip for the mouse-OCT workload —
512x1024 single-channel B-scans, batch 8, U-Net (32 base filters, bf16)
inference fused with softmax -> boundary-map conversion -> min-path
boundary extraction (3 boundaries), entirely on device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "B-scans/s", "vs_baseline": N}

``vs_baseline`` follows BASELINE.md's north star (">= 10x Keras-CPU
B-scans/sec on one v5e chip"): the baseline is 10x the throughput of the
same fused pipeline run on one CPU host thread-pool (a conservative
stand-in for the Keras-CPU reference, which is not installable here), so
vs_baseline >= 1.0 means the target is met.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np


H, W, BATCH, NUM_CLASSES = 512, 1024, 8, 4
WARMUP, ITERS = 3, 10
CPU_BATCH = 2  # CPU proxy measured on a smaller batch (throughput scaled)
CPU_CACHE = ".bench_cpu_baseline.json"


def build(dtype, minpath_backend="auto", batch=BATCH):
    from oct_image_segmentation_models_tpu.models import get_model_class
    from oct_image_segmentation_models_tpu.ops.inference import make_fused_pipeline

    container = get_model_class("unet")(
        input_channels=1,
        num_classes=NUM_CLASSES,
        image_height=H,
        image_width=W,
        start_neurons=32,
        dtype=dtype,
    )
    module = container.build_model()
    pipeline = make_fused_pipeline(
        module,
        container.get_preprocess_input_fn(),
        with_graph_search=True,
        minpath_backend=minpath_backend,
    )
    return module, pipeline


def init_variables(module, device):
    with jax.default_device(device):
        return module.init(
            jax.random.PRNGKey(0),
            np.zeros((1, H, W, 1), np.float32),
            training=False,
        )


def measure_cpu_proxy(images_np):
    """Same fused pipeline on the CPU backend (one batch, cached to disk):
    a conservative stand-in for the Keras-CPU reference."""
    import os

    if os.path.exists(CPU_CACHE):
        with open(CPU_CACHE) as fh:
            return json.load(fh)["cpu_bscans_per_s"]
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return float("nan")
    module_cpu, pipeline_cpu = build("float32", minpath_backend="xla")
    with jax.default_device(cpu):
        variables_cpu = init_variables(module_cpu, cpu)
        images_cpu = jax.device_put(images_np[:CPU_BATCH], cpu)
        out = pipeline_cpu(variables_cpu, images_cpu)  # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = pipeline_cpu(variables_cpu, images_cpu)
        jax.block_until_ready(out)
        tp = CPU_BATCH / (time.perf_counter() - t0)
    with open(CPU_CACHE, "w") as fh:
        json.dump({"cpu_bscans_per_s": tp}, fh)
    return tp


def run(pipeline, variables, images, iters):
    # warmup / compile
    out = pipeline(variables, images)
    jax.block_until_ready(out)
    for _ in range(WARMUP - 1):
        jax.block_until_ready(pipeline(variables, images))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(variables, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return (BATCH * iters) / dt


def main():
    rng = np.random.default_rng(0)
    images_np = rng.integers(0, 255, size=(BATCH, H, W, 1), dtype=np.uint8)

    accel = jax.devices()[0]
    module, pipeline = build("bfloat16")
    variables = init_variables(module, accel)
    images = jax.device_put(images_np, accel)
    tp_accel = run(pipeline, variables, images, ITERS)

    tp_cpu = measure_cpu_proxy(images_np)

    baseline = 10.0 * tp_cpu  # north star: 10x CPU throughput
    vs_baseline = tp_accel / baseline if np.isfinite(baseline) else None

    print(
        json.dumps(
            {
                "metric": "B-scans/sec/chip (512x1024 batch-8 U-Net infer"
                "+boundary-maps+min-path, bf16)",
                "value": round(tp_accel, 3),
                "unit": "B-scans/s",
                "vs_baseline": (
                    round(vs_baseline, 3) if vs_baseline is not None else None
                ),
                "detail": {
                    "device": str(accel),
                    "cpu_proxy_bscans_per_s": (
                        round(tp_cpu, 3) if np.isfinite(tp_cpu) else None
                    ),
                    "baseline_definition": "10x same-pipeline CPU throughput",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
