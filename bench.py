#!/usr/bin/env python
"""Headline benchmark: B-scans/sec on one chip for the mouse-OCT workload —
512x1024 single-channel B-scans, batch 8, U-Net (32 base filters)
inference fused with softmax -> boundary-map conversion -> min-path
boundary extraction (3 boundaries, Pallas kernel), entirely on device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "B-scans/s", "vs_baseline": N}

Timing methodology: the fused pipeline is iterated K times *inside one
jit* (a lax.scan whose carry depends on each iteration's input), so the
measurement is pure device time — immune to host/tunnel launch overhead
and async-dispatch artifacts (block_until_ready is unreliable under the
axon tunnel used in this environment).

The accelerator path runs the space-to-depth transformed conv stack
(ops/s2d_unet.py: BN folded, top two levels in s2d(2) layout so every
conv feeds the 128-wide MXU lane dimension fully) — numerically
equivalent to the parity module to ~3e-4 in probability space.

``vs_baseline`` follows BASELINE.md's north star (">= 10x Keras-CPU
B-scans/sec on one v5e chip"): the baseline is 10x the measured
throughput of the REFERENCE'S OWN pipeline on this host's CPU — the
upstream package imported from /root/reference at runtime (its
``build_model()`` Keras U-Net + ``perform_argmax`` /
``convert_predictions_to_maps_semantic`` + heapq-Dijkstra
``segment_maps``, the `prediction/prediction.py:70-160` flow minus
artifact writing). Measured once and cached in
.bench_cpu_baseline.json; vs_baseline >= 1.0 means the target is met.
When the reference tree or TensorFlow is unavailable, the baseline
falls back to the same fused JAX pipeline on the CPU backend (a
conservative proxy — it is several times FASTER than the reference's
Python Dijkstra, so it understates vs_baseline).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from oct_image_segmentation_models_tpu.common.tunnel import probe_backend

H, W, BATCH, NUM_CLASSES = 512, 1024, 8, 4
K_ITERS = 10
CPU_BATCH = 2
CPU_CACHE = ".bench_cpu_baseline.json"


def build_pipeline(dtype, minpath_backend, k, mode="s2d", tie_parity="exact"):
    """Flagship inference pipeline builder.

    mode: "s2d" (BN-folded space-to-depth conv stack, the optimized
    path), "folded" (BN-folded parity module), or "parity" (the exact
    training module). tie_parity: min-path tie-break mode (see
    ops/minpath.py) — "fast" is the workflow-surface default
    (cost-optimal, ~2.9x faster kernel; worst-case tie divergence
    measured inside the 0.05 px BASELINE budget by tests/test_minpath.py
    ::test_flagship_scale_fast_tie_parity_budget); "exact" bit-matches
    the reference heap and benches ~226 vs ~297 B-scans/s. main()
    measures BOTH and reports the default as `value`.
    Returns (module, loop_factory) where ``loop_factory(variables)``
    jits the K-iteration pipeline loop over uint8 images.
    """
    from oct_image_segmentation_models_tpu.models import get_model_class
    from oct_image_segmentation_models_tpu.models.unet import (
        UNetModule,
        fold_batchnorm_variables,
    )
    from oct_image_segmentation_models_tpu.ops import boundary as bops
    from oct_image_segmentation_models_tpu.ops import minpath as mops
    from oct_image_segmentation_models_tpu.ops.minpath_pallas import (
        delineate_pallas_s2d,
    )
    from oct_image_segmentation_models_tpu.ops.s2d_unet import build_s2d_apply

    container = get_model_class("unet")(
        input_channels=1,
        num_classes=NUM_CLASSES,
        image_height=H,
        image_width=W,
        start_neurons=32,
        dtype=dtype,
    )
    module = container.build_model()
    preprocess = container.get_preprocess_input_fn()

    def make_loop(apply_with_vars):
        # variables stay a jit *argument* (captured constants >~100 MB
        # overflow the remote compiler's request limit, see PLAN.md); the
        # s2d mode necessarily embeds its transformed kernels instead.
        @jax.jit
        def loop(variables, images_u8):
            def body(carry, _):
                # fold the carry into the input so iterations cannot be CSE'd
                x = preprocess(images_u8.astype(jnp.float32) + carry)
                out = apply_with_vars(variables, x)
                if mode == "s2d":
                    # labels_s2d forward: softmax/argmax/boundary-ridge all
                    # stay in the s2d domain, maps feed the Pallas kernel
                    # through its s2d packing entry (see ops/inference.py);
                    # non-TPU hosts fall back to the XLA min-path.
                    maps_s2d = bops.boundary_maps_from_s2d_labels(
                        out, NUM_CLASSES, transposed="s2d"
                    )
                    if mops.resolve_backend(minpath_backend):
                        delins = delineate_pallas_s2d(
                            maps_s2d, tie_parity=tie_parity
                        )
                    else:
                        delins = mops.delineate(
                            bops.s2d_maps_to_transposed(maps_s2d),
                            tie_parity=tie_parity,
                            backend=minpath_backend,
                        )
                else:
                    # f32 one-hot conversion: composes better with the
                    # Pallas min-path than the integer path on a
                    # probability forward (see ops/inference.py).
                    _, categorical = bops.perform_argmax(out, bin=True)
                    maps = bops.boundary_prob_maps(categorical)
                    delins = mops.delineate_image_maps(
                        maps, backend=minpath_backend
                    )
                return (carry + 1) % 2, delins

            carry, delins = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return carry, delins

        return loop

    def loop_factory(variables):
        import functools

        if mode == "s2d":
            apply_fn = build_s2d_apply(
                dict(variables),
                container.get_config(),
                dtype=jnp.dtype(dtype),
                output="labels_s2d",
            )
            return functools.partial(make_loop(lambda _, x: apply_fn(x)), 0)
        if mode == "folded":
            folded = fold_batchnorm_variables(dict(variables))
            inf_module = UNetModule(
                num_classes=NUM_CLASSES,
                start_neurons=32,
                dtype=jnp.dtype(dtype),
                use_bn=False,
            )
            loop = make_loop(
                lambda v, x: inf_module.apply(v, x, training=False)
            )
            return functools.partial(loop, folded)
        loop = make_loop(lambda v, x: module.apply(v, x, training=False))
        return functools.partial(loop, dict(variables))

    return module, loop_factory


def time_loop(module, loop_factory, device, images_np, k, reps=3):
    with jax.default_device(device):
        variables = module.init(
            jax.random.PRNGKey(0),
            np.zeros((1, H, W, 1), np.float32),
            training=False,
        )
        loop = loop_factory(dict(variables))
        images = jax.device_put(images_np, device)
        out = loop(images)
        np.asarray(out[0])  # compile + drain
        # Best-of-reps: the minimum wall time is the least-perturbed
        # measurement (tunnel jitter and chip clock drift only ever add
        # time; ~5% session-to-session drift observed, PLAN.md).
        dt = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(images)
            np.asarray(out[0])  # forces a real device sync
            dt = min(dt, time.perf_counter() - t0)
    return (images_np.shape[0] * k) / dt


def _cpu_pipeline_hash():
    """Fingerprint of the parity pipeline the CPU baseline runs, so the
    cached denominator regenerates whenever its definition changes (a
    stale cache would silently skew every future ``vs_baseline``)."""
    import hashlib

    pkg = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "oct_image_segmentation_models_tpu",
    )
    digest = hashlib.md5()
    digest.update(f"{H}x{W} b{CPU_BATCH} c{NUM_CLASSES}".encode())
    for rel in (
        "models/unet.py",
        "models/base_model.py",
        "ops/boundary.py",
        "ops/minpath.py",
    ):
        with open(os.path.join(pkg, rel), "rb") as fh:
            digest.update(fh.read())
    return digest.hexdigest()


def _read_cache() -> dict:
    if os.path.exists(CPU_CACHE):
        try:
            with open(CPU_CACHE) as fh:
                return json.load(fh)
        except (json.JSONDecodeError, OSError):
            pass
    return {}


def _update_cache(entries: dict) -> None:
    cache = _read_cache()
    cache.update(entries)
    with open(CPU_CACHE, "w") as fh:
        json.dump(cache, fh)


def measure_cpu_proxy(images_np, required=True):
    """JAX-CPU proxy baseline (fallback / diagnostic).

    A cache hit is free; an actual measurement recompiles + re-times the
    parity pipeline on the CPU backend (minutes on this 1-core box), so
    when ``required`` is False (the reference Keras-CPU baseline already
    supplied the denominator) a cache miss returns nan instead of
    paying that cost for a detail field. BENCH_FORCE_CPU_PROXY=1
    forces the measurement.
    """
    pipeline_hash = _cpu_pipeline_hash()
    cached = _read_cache()
    if cached.get("pipeline_hash") == pipeline_hash:
        return cached["cpu_bscans_per_s"]
    if not required and os.environ.get("BENCH_FORCE_CPU_PROXY") != "1":
        return float("nan")
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return float("nan")
    module, loop_factory = build_pipeline("float32", "xla", 1, mode="parity")
    tp = time_loop(module, loop_factory, cpu, images_np[:CPU_BATCH], 1)
    _update_cache({"cpu_bscans_per_s": tp, "pipeline_hash": pipeline_hash})
    return tp


REF_ROOT = "/root/reference"
REF_BASELINE_VERSION = 1


def _ref_baseline_key(n_images):
    """Cache key for the reference Keras-CPU baseline: methodology
    version + the geometry/model constants the measurement depends on +
    the measurement code itself, so edits to any of them regenerate the
    cached denominator instead of silently skewing ``vs_baseline``
    (same auto-invalidation contract as :func:`_cpu_pipeline_hash`)."""
    import hashlib
    import inspect

    digest = hashlib.md5()
    digest.update(
        f"v{REF_BASELINE_VERSION} {H}x{W} c{NUM_CLASSES} n{n_images} "
        "start_neurons32".encode()
    )
    digest.update(inspect.getsource(measure_reference_keras_cpu).encode())
    return digest.hexdigest()


def _import_reference_predict_path():
    """Import the upstream package's predict-path modules as a runtime
    baseline oracle (no code is copied; the tree is read-only).

    The predict path itself needs only TF/Keras + numpy/heapq, but the
    reference's ``common.utils`` module-level imports pull in deps that
    are not installed here (mlflow, focal-loss, surface-distance) and
    Keras-2-only symbols (``keras.utils.losses_utils``,
    ``keras.engine`` in a type annotation) — none of which the timed
    path ever calls. Light stubs satisfy those imports; ``sys.modules``
    and patched keras attributes are restored afterwards. Returns
    ``(get_model_class, ref_utils, ref_graph_search)`` or ``None`` when
    the tree / TF are unavailable.
    """
    import sys
    import types

    if not os.path.isdir(REF_ROOT):
        return None
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

    stubs = {}

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        for key, val in attrs.items():
            setattr(mod, key, val)
        stubs[name] = mod
        return mod

    mlflow = stub("mlflow")
    mlflow.exceptions = stub(
        "mlflow.exceptions",
        MlflowException=type("MlflowException", (Exception,), {}),
    )
    stub(
        "focal_loss",
        SparseCategoricalFocalLoss=type(
            "SparseCategoricalFocalLoss", (), {}
        ),
    )
    stub(
        "surface_distance",
        compute_surface_distances=None,
        compute_average_surface_distance=None,
        compute_robust_hausdorff=None,
    )

    try:
        import keras as real_keras
        import keras.utils as keras_utils
    except ImportError:
        return None

    patched_losses_utils = not hasattr(keras_utils, "losses_utils")
    if patched_losses_utils:
        lu = stub("keras.utils.losses_utils")
        lu.ReductionV2 = types.SimpleNamespace(
            AUTO="auto",
            NONE=None,
            SUM="sum",
            SUM_OVER_BATCH_SIZE="sum_over_batch_size",
        )
        keras_utils.losses_utils = lu
    patched_engine = not hasattr(real_keras, "engine")
    if patched_engine:
        real_keras.engine = types.SimpleNamespace(
            functional=types.SimpleNamespace(Functional=object)
        )

    saved = {name: sys.modules.get(name) for name in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF_ROOT)
    try:
        from oct_image_segmentation_models.common import utils as ref_utils
        from oct_image_segmentation_models.min_path_processing import (
            graph_search as ref_gs,
        )
        from oct_image_segmentation_models.models import get_model_class
    except Exception:
        return None
    finally:
        sys.path.remove(REF_ROOT)
        for name, prev in saved.items():
            if prev is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = prev
        if patched_losses_utils:
            delattr(keras_utils, "losses_utils")
        if patched_engine:
            delattr(real_keras, "engine")
    return get_model_class, ref_utils, ref_gs


def measure_reference_keras_cpu(images_np, n_images=1):
    """True Keras-CPU baseline: the reference's own pipeline on this CPU.

    Times the `prediction/prediction.py:70-160` flow with graph search —
    ``build_model()`` Keras ``predict`` (batch 1) -> ``perform_argmax``
    -> ``convert_predictions_to_maps_semantic`` -> transposes ->
    heapq-Dijkstra ``segment_maps`` — for ``n_images`` flagship-scale
    B-scans, artifact writing and area-mask reconstruction excluded on
    both sides. One warmup ``predict`` is excluded (steady-state, like
    the accelerated number). Cached: the reference tree is immutable, so
    the measurement is keyed on the methodology version, the benchmark
    constants, and this function's own source (:func:`_ref_baseline_key`).
    Measure on an otherwise-idle box — a concurrent CPU load (e.g. the
    test suite on this 1-core host) deflates the denominator and
    inflates ``vs_baseline``; a contended measurement is used for the
    current run (with a warning) but never cached. Returns B-scans/s
    or nan.
    """
    key = _ref_baseline_key(n_images)
    cached = _read_cache()
    if cached.get("reference_baseline_key") == key:
        return cached["reference_keras_cpu_bscans_per_s"]

    imported = _import_reference_predict_path()
    if imported is None:
        return float("nan")
    get_model_class, ref_utils, ref_gs = imported

    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = 0.0
    cpus = os.cpu_count() or 1
    contended = load1 > 0.75 * cpus
    if contended:
        import sys

        print(
            f"bench: WARNING — measuring the reference Keras-CPU baseline "
            f"under CPU contention (load {load1:.2f} on {cpus} CPU(s)); the "
            "deflated denominator inflates THIS run's vs_baseline and will "
            "NOT be cached — re-run on an idle box for a cacheable "
            "measurement.",
            file=sys.stderr,
            flush=True,
        )

    try:
        container = get_model_class("unet")(
            input_channels=1,
            num_classes=NUM_CLASSES,
            image_height=H,
            image_width=W,
            start_neurons=32,
        )
        model = container.build_model()
        preprocess = container.get_preprocess_input_fn()

        images = images_np[:n_images].astype(np.float64)
        model.predict(
            np.expand_dims(preprocess(images[0]), axis=0),
            verbose=0,
            batch_size=1,
        )  # warmup: oneDNN autotuning + trace

        t0 = time.perf_counter()
        for img in images:
            probs = model.predict(
                np.expand_dims(preprocess(img), axis=0),
                verbose=0,
                batch_size=1,
            )
            _, categorical = ref_utils.perform_argmax(probs, bin=True)
            maps = ref_utils.convert_predictions_to_maps_semantic(
                np.array(categorical), bg_ilm=True, bg_csi=False
            )
            maps = np.squeeze(maps)
            img_t = np.transpose(img, (1, 0, 2))
            maps_t = np.transpose(maps, (0, 2, 1))
            graph_structure = ref_gs.create_graph_structure(img_t.shape)
            ref_gs.segment_maps(maps_t, None, graph_structure)
        tp = n_images / (time.perf_counter() - t0)
    except Exception as exc:
        import sys

        print(
            f"bench: reference Keras-CPU baseline failed ({exc!r}); "
            "falling back to the JAX-CPU proxy",
            file=sys.stderr,
            flush=True,
        )
        return float("nan")

    if not contended:
        # never persist a contention-deflated denominator: the cache
        # would silently inflate every FUTURE vs_baseline, not just
        # this run's
        _update_cache(
            {
                "reference_keras_cpu_bscans_per_s": tp,
                "reference_baseline_key": key,
            }
        )
    return tp


def wait_for_accelerator(max_wait_s=900, probe_timeout_s=120):
    """Ride out a tunnel outage before touching jax in this process.

    The axon tunnel drops for stretches (PLAN.md): ``jax.devices()``
    then either raises or HANGS, so each probe runs in a subprocess
    with a hard timeout (:func:`...common.tunnel.probe_backend`) and
    this process only initialises its backend after a probe succeeds.
    Returns "up" when an accelerator answered; "error"/"hang" after
    ``max_wait_s`` depending on the last probe's failure mode ("error"
    means this process can proceed and fail fast with the real backend
    error; "hang" means jax.devices() here would block forever, so the
    caller must exit instead). Tunable via BENCH_TUNNEL_WAIT_S=0 to
    skip.
    """
    import sys

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        last, _n_devices = probe_backend(probe_timeout_s)
        if last == "up":
            return "up"
        if time.time() >= deadline:
            return last
        print(
            f"bench: accelerator probe {attempt} failed (tunnel down?); "
            f"retrying for {deadline - time.time():.0f}s more",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(min(30, max(1, deadline - time.time())))


def main():
    rng = np.random.default_rng(0)
    images_np = rng.integers(0, 255, size=(BATCH, H, W, 1), dtype=np.uint8)

    # Outages last an hour+ (PLAN.md); default to riding out most of one
    # so a driver-invoked bench still records a number. BENCH_TUNNEL_WAIT_S
    # tunes/disables the wait.
    wait_s = float(os.environ.get("BENCH_TUNNEL_WAIT_S", "2400"))
    if wait_s > 0 and wait_for_accelerator(max_wait_s=wait_s) == "hang":
        # jax.devices() in THIS process would block forever; a bounded,
        # diagnosable failure beats an indefinite hang for the caller.
        import sys

        print(
            "bench: accelerator unreachable (backend init hangs — tunnel "
            f"outage) after waiting {wait_s:.0f}s; aborting",
            file=sys.stderr,
            flush=True,
        )
        sys.exit(1)
    accel = jax.devices()[0]
    # "fast" IS the workflow-surface default (prediction/evaluation/CLI/
    # VolumeSegmenter/export all default minpath_tie_parity="fast"), so
    # the headline `value` is the number a default-config user gets; the
    # other mode is measured too and disclosed in the same JSON
    # (BENCH_SKIP_ALT=1 skips the second measurement).
    tie_parity = os.environ.get("BENCH_TIE_PARITY", "fast")
    import sys as _sys

    t_start = time.time()
    print(
        f"bench: compiling + timing the {tie_parity}-tie pipeline...",
        file=_sys.stderr,
        flush=True,
    )
    module, loop_factory = build_pipeline(
        "float32", "auto", K_ITERS, mode="s2d", tie_parity=tie_parity
    )
    tp_accel = time_loop(module, loop_factory, accel, images_np, K_ITERS)
    alt_parity = "exact" if tie_parity == "fast" else "fast"
    tp_alt = None
    # The remote compiler has a degraded mode where big compiles take
    # 15-20 min (PLAN.md r3 gotcha). If the headline measurement already
    # burned that long, skip the disclosure-only alt-mode measurement
    # rather than risk the caller's timeout killing the whole run.
    alt_budget = float(os.environ.get("BENCH_ALT_BUDGET_S", "900"))
    if os.environ.get("BENCH_SKIP_ALT", "0") == "1":
        pass
    elif time.time() - t_start > alt_budget:
        print(
            f"bench: headline measurement took {time.time() - t_start:.0f}s "
            "(degraded compile window?); skipping the alt-tie-mode "
            "measurement",
            file=_sys.stderr,
            flush=True,
        )
    else:
        print(
            f"bench: {tp_accel:.1f} B-scans/s; compiling + timing the "
            f"{alt_parity}-tie mode...",
            file=_sys.stderr,
            flush=True,
        )
        _, alt_factory = build_pipeline(
            "float32", "auto", K_ITERS, mode="s2d", tie_parity=alt_parity
        )
        tp_alt = time_loop(module, alt_factory, accel, images_np, K_ITERS)

    tp_ref = measure_reference_keras_cpu(images_np)
    tp_cpu = measure_cpu_proxy(images_np, required=not np.isfinite(tp_ref))
    tp_base = tp_ref if np.isfinite(tp_ref) else tp_cpu
    baseline_definition = (
        "10x reference Keras-CPU (upstream package's own predict+min-path "
        "on this host's CPU)"
        if np.isfinite(tp_ref)
        else "10x same-pipeline CPU throughput (JAX-CPU proxy)"
    )
    baseline = 10.0 * tp_base
    vs_baseline = tp_accel / baseline if np.isfinite(baseline) else None

    print(
        json.dumps(
            {
                "metric": "B-scans/sec/chip (512x1024 batch-8 U-Net infer"
                "+boundary-maps+min-path)",
                "value": round(tp_accel, 3),
                "unit": "B-scans/s",
                "vs_baseline": (
                    round(vs_baseline, 3) if vs_baseline is not None else None
                ),
                "detail": {
                    "device": str(accel),
                    "minpath_tie_parity": tie_parity
                    + (
                        " (the workflow-surface default: cost-optimal,"
                        " <0.05 px budget test in suite; 'exact' gives"
                        " reference-heap bit-parity)"
                        if tie_parity == "fast"
                        else ""
                    ),
                    f"value_{alt_parity}_tie_parity": (
                        round(tp_alt, 3) if tp_alt is not None else None
                    ),
                    "reference_keras_cpu_bscans_per_s": (
                        round(tp_ref, 4) if np.isfinite(tp_ref) else None
                    ),
                    "cpu_proxy_bscans_per_s": (
                        round(tp_cpu, 4) if np.isfinite(tp_cpu) else None
                    ),
                    "baseline_definition": baseline_definition,
                    "timing": "best of 3 reps of K=10 pipeline "
                    "iterations inside one jit",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
