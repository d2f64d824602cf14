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


# --- On-device correctness gate + train phase (VERDICT r3 #1/#2/#4) ---
#
# Everything above times the hardware; nothing before r4 ever CHECKED the
# hardware's outputs (tests are CPU-pinned, Pallas tests run
# interpret=True). The gate below runs on the real chip before timing:
#   (a) kernel probe — the Mosaic-compiled Pallas kernel (both tie
#       modes) must be BITWISE equal to the CPU XLA DP on a fixed probe
#       set spanning realistic ridges, plateaus, sparse- and dense-
#       random maps, and the exact mode must bit-match the heapq host
#       oracle on the realistic maps;
#   (b) pipeline probe — the full fused s2d device pipeline, on a
#       deterministic briefly-trained checkpoint, must produce boundary
#       rows within the 0.05 px BASELINE north-star budget of the
#       CPU-float32 parity pipeline (this is the first measurement of
#       that budget on the hardware the benchmark runs on: the MXU
#       multiplies f32 convs in bf16, so device probability maps differ
#       from everything the CPU suite verifies).
# Results go into the JSON's detail.device_parity; failure exits 1.

# Forward FLOPs of the s2d conv stack at (8, 512, 1024): per-conv
# profile sum (tools/profile_convs.py, PLAN.md r2 — pinned by
# tests/test_bench_baseline.py).
MODEL_FWD_TFLOPS_BATCH8 = 2.282
BF16_PEAK_TFLOPS = 197.0  # TPU v5e (v5litepod) bf16 MXU peak

# Deterministic "briefly-trained" checkpoint for the pipeline parity
# probe. 120 steps + precise-BN finalization: a 48-step checkpoint's
# rolling statistics are still 62% init (0.99^48), leaving near-uniform
# probabilities whose argmax flips under the ~3e-4 s2d-vs-parity
# numeric wobble — the probe would then measure checkpoint degeneracy,
# not device parity (measured: MAE 0.54 px at 48 steps with rolling
# stats vs sharp boundaries after precise-BN finalization).
N_BRIEF_TRAIN_STEPS = int(os.environ.get("BENCH_BRIEF_STEPS", "120"))
N_TRAIN_TIMED = 10


def _tests_on_path():
    import sys

    p = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests")
    if p not in sys.path:
        sys.path.insert(0, p)


def make_probe_maps(w=W, h=H):
    """Deterministic (8, W, H) uint8 probe maps in the transposed
    (column, row) kernel orientation: 3 realistic blurred ridges,
    2 plateau ridges (2- and 3-row-wide), 1 sparse-random, 2
    dense-random — the families the CPU suite pins kernel-vs-XLA
    bitwise equality on (tests/test_minpath_pallas.py)."""
    from scipy import ndimage

    rng = np.random.default_rng(1234)
    maps = []

    def ridge_rows():
        steps = rng.integers(-2, 3, size=w)
        return np.clip(h // 2 + np.cumsum(steps), 4, h - 4)

    for _ in range(3):  # realistic
        m = np.zeros((w, h), np.float32)
        m[np.arange(w), ridge_rows()] = 1.0
        m = ndimage.gaussian_filter(m, sigma=(0.8, 1.4))
        m = np.clip(m / m.max() + rng.normal(0, 0.01, m.shape), 0, 1)
        maps.append((m * 255).astype(np.uint8))
    for wide in (1, 2):  # plateau
        m = np.zeros((w, h), np.uint8)
        m[np.arange(w), ridge_rows()] = 255
        for k in range(1, wide + 1):
            m |= np.roll(m, 1, axis=1)
        maps.append(m)
    maps.append(((rng.random((w, h)) < 0.12) * 255).astype(np.uint8))
    for p in (0.30, 0.40):  # dense-random (adversarial)
        maps.append(((rng.random((w, h)) < p) * 255).astype(np.uint8))
    return np.stack(maps)


def device_parity_kernel_probe(accel, n_oracle=3):
    """Pallas-on-TPU vs XLA-on-CPU bitwise equality (both tie modes) +
    exact mode vs the heapq oracle on realistic maps. Returns a dict of
    booleans (True = parity holds)."""
    from oct_image_segmentation_models_tpu.ops import minpath as mops
    from oct_image_segmentation_models_tpu.ops.minpath_pallas import (
        delineate_pallas,
    )

    maps = make_probe_maps()
    cpu = jax.devices("cpu")[0]
    out = {}
    for mode in ("fast", "exact"):
        dev = np.asarray(
            delineate_pallas(jax.device_put(maps, accel), tie_parity=mode)
        )
        with jax.default_device(cpu):
            ref = np.asarray(
                mops.delineate(maps, tie_parity=mode, backend="xla")
            )
        mismatches = int((dev != ref).sum())
        out[f"kernel_bitwise_{mode}"] = mismatches == 0
        if mode == "exact":
            _tests_on_path()
            from oracle_minpath import dijkstra_delineate

            ok = True
            for i in range(n_oracle):  # realistic maps only (indices 0-2)
                ok &= bool(
                    np.array_equal(dev[i], dijkstra_delineate(maps[i]))
                )
            out["exact_oracle_bitwise"] = ok
    return out


def _synth_flagship_batch(rng, n):
    """(n, H, W, 1) uint8 layered images + (n, H, W, 1) float32 labels."""
    _tests_on_path()
    from synth import make_layered_sample

    images, labels = [], []
    for _ in range(n):
        img, lab, _ = make_layered_sample(rng, H, W, NUM_CLASSES)
        images.append(img)
        labels.append(lab)
    return (
        np.stack(images)[..., None],
        np.stack(labels)[..., None].astype(np.float32),
    )


def train_brief_and_measure(accel, n_timed=N_TRAIN_TIMED,
                            n_total=N_BRIEF_TRAIN_STEPS):
    """Train the flagship config briefly on deterministic synthetic
    layered data ON THE CHIP; returns (train B-scans/s, variables).

    The timed window reproduces tools/bench_train.py's methodology
    (BASELINE config #3: batch 8, 512x1024, focal_dice, bf16 s2d
    forward; 2 warmup/compile steps, then ``n_timed`` real dispatches);
    the remaining steps continue to ``n_total`` so the returned
    checkpoint is deterministic and ridge-shaped enough for the
    pipeline parity probe (random weights give near-uniform probs whose
    argmax is noise — see .claude/skills/verify/SKILL.md)."""
    import jax.random as jrandom

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
        num_classes=NUM_CLASSES,
        image_height=H,
        image_width=W,
        start_neurons=32,
        dtype="bfloat16",
    )
    module = container.build_model()
    preprocess = container.get_preprocess_input_fn()
    variables = module.init(
        jax.random.PRNGKey(0),
        np.zeros((1, H, W, 1), np.float32),
        training=False,
    )
    compute_module = (
        maybe_build_s2d_train(module, container.get_config(), H, W) or module
    )
    loss_fn = losses.custom_loss_objects["focal_dice_loss"]["function"](
        num_classes=NUM_CLASSES, is_y_true_sparse=True
    )
    metric_fn = metrics.dice_coef_macro(True, NUM_CLASSES)
    mesh = create_mesh([accel])
    tx = build_optimizer("adam", {"learning_rate": 1e-3})
    state = create_train_state(dict(variables), tx, mesh)
    train_step = make_train_step(compute_module, tx, loss_fn, metric_fn, mesh)

    rng = np.random.default_rng(7)
    n_batches = 4
    batches = []
    for _ in range(n_batches):
        img, lab = _synth_flagship_batch(rng, BATCH)
        batches.append(
            (
                jax.device_put(
                    np.asarray(preprocess(img.astype(np.float32))), accel
                ),
                jax.device_put(lab, accel),
            )
        )

    import sys

    # TWO warmups: first compile + the donated-buffer-layout recompile
    # (PLAN.md "double-compile lesson" — timing after one warmup
    # averages a ~30 s recompile into the steady state).
    print("bench: compiling train step...", file=sys.stderr, flush=True)
    state, loss, _ = train_step(state, *batches[0], jrandom.PRNGKey(0))
    float(loss)
    state, loss, _ = train_step(state, *batches[1 % n_batches],
                                jrandom.PRNGKey(1))
    float(loss)
    t0 = time.perf_counter()
    for i in range(n_timed):
        b = batches[(2 + i) % n_batches]
        state, loss, _ = train_step(state, *b, jrandom.PRNGKey(2 + i))
    float(loss)  # drain the async chain
    tp = BATCH * n_timed / (time.perf_counter() - t0)
    for i in range(2 + n_timed, n_total):
        b = batches[i % n_batches]
        state, loss, _ = train_step(state, *b, jrandom.PRNGKey(i))
    final_loss = float(loss)
    print(
        f"bench: train {tp:.2f} B-scans/s; brief checkpoint at step "
        f"{n_total} (loss {final_loss:.4f}); finalizing BN statistics...",
        file=sys.stderr,
        flush=True,
    )
    # Precise-BN finalization (ops/bn_refresh.py, same as the training
    # driver's default): the rolling stats of a brief run are mostly
    # init values, which degrades the eval-mode forward the parity
    # probe runs. Also exercises bn_refresh on the real chip.
    from oct_image_segmentation_models_tpu.ops.bn_refresh import (
        compute_precise_batch_stats,
    )

    precise_stats = compute_precise_batch_stats(
        compute_module,
        state.params,
        state.batch_stats,
        [b[0] for b in batches],
        jrandom.PRNGKey(99),
    )
    variables = {
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, precise_stats),
    }
    return tp, variables


def pipeline_parity_probe(accel, variables, n_cpu=2):
    """Device boundary rows (fused s2d pipeline, the workflow default)
    vs the CPU-float32 parity pipeline (exact ties) on a deterministic
    synthetic eval batch. Returns (mae_px, divergent_col_fraction).

    Compares the first ``n_cpu`` images only on the CPU side (the
    parity pipeline takes minutes per image on this 1-core host);
    BN runs in eval mode so per-image outputs are batch-independent."""
    rng = np.random.default_rng(11)
    images, _ = _synth_flagship_batch(rng, BATCH)

    module, loop_factory = build_pipeline(
        "float32", "auto", 1, mode="s2d", tie_parity="fast"
    )
    with jax.default_device(accel):
        loop = loop_factory(dict(variables))
        dev_out = np.asarray(loop(jax.device_put(images, accel))[1])[0]

    cpu = jax.devices("cpu")[0]
    _, cpu_factory = build_pipeline(
        "float32", "xla", 1, mode="parity", tie_parity="exact"
    )
    with jax.default_device(cpu):
        cpu_loop = cpu_factory(dict(variables))
        cpu_out = np.asarray(cpu_loop(images[:n_cpu])[1])[0]

    dev = dev_out[:n_cpu].astype(np.float64)
    ref = cpu_out.astype(np.float64)
    mae = float(np.abs(dev - ref).mean())
    div = float((dev != ref).mean())
    return mae, div


def run_kernel_probe_with_retry(probe_fn, log=None, retry_delay_s=20.0):
    """Run the kernel parity probe, retrying ONCE on a crash (VERDICT r4
    #6) before fail-opening to a disclosed ``probe_error`` dict (which
    :func:`parity_verdict` turns into ``ok=None`` — parity UNKNOWN, run
    not failed). A mismatch is not an exception and never retries —
    fail-closed semantics are untouched.

    The retry waits ``retry_delay_s`` first: the crash mode worth
    retrying is a transient tunnel hiccup, which lasts seconds — an
    immediate back-to-back retry lands inside the same hiccup.
    ``MemoryError`` is not retried at all (a CPU OOM compiling the
    reference DP is deterministic; a second multi-minute compile only
    doubles the cost of the same fail-open)."""
    log = log or (lambda msg: None)
    try:
        return probe_fn()
    except MemoryError as exc:
        log(f"kernel parity probe OOMed ({exc!r}); not retrying")
        return {"probe_error": repr(exc)}
    except Exception as first_exc:  # noqa: BLE001 — disclosed below
        log(
            f"kernel parity probe CRASHED ({first_exc!r}); retrying once "
            f"in {retry_delay_s:g}s"
        )
        time.sleep(retry_delay_s)
        try:
            return probe_fn()
        except Exception as exc:  # noqa: BLE001 — disclosed, not hidden
            log(f"kernel parity probe retry CRASHED ({exc!r})")
            return {
                "probe_error": repr(exc),
                "probe_error_first_attempt": repr(first_exc),
            }


PARITY_BUDGET_PX = 0.05


def parity_verdict(device_parity: dict) -> bool:
    """Finalize the gate verdict in place; returns True when the run
    must FAIL (exit nonzero).

    Semantics (unit-tested in tests/test_bench_baseline.py):
    - ``probe_error`` present → the probe CRASHED before producing
      evidence: parity is UNKNOWN (``ok=None``), run NOT failed — the
      error field is the disclosure (fail-open on infrastructure).
    - otherwise every kernel check must be True and, when the pipeline
      probe produced a number, it must be within the 0.05 px budget;
      a probe that RAN and disagrees fails the run (fail-closed).
      A ``pipeline_probe_error`` is disclosed but, like a skipped
      probe, leaves the kernel verdict in charge."""
    if "probe_error" in device_parity:
        device_parity["ok"] = None
        return False
    device_parity["budget_px"] = PARITY_BUDGET_PX
    device_parity["ok"] = (
        device_parity.get("kernel_bitwise_fast", False)
        and device_parity.get("kernel_bitwise_exact", False)
        and device_parity.get("exact_oracle_bitwise", False)
        and (
            device_parity.get("pipeline_mae_px") is None
            or device_parity["pipeline_mae_px"] <= PARITY_BUDGET_PX
        )
    )
    return not device_parity["ok"]


def measure_reference_train_keras_cpu_cached():
    """The upstream ``model.fit`` Keras-CPU baseline, via the canonical
    implementation in tools/bench_train.py (one source of truth for the
    methodology AND its cache key — the key digests that function's own
    source, so duplicating it here would silently fork the cache)."""
    import importlib.util

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "bench_train.py"
    )
    spec = importlib.util.spec_from_file_location("bench_train", path)
    bt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bt)
    return bt.measure_reference_train_keras_cpu()


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

    # --- On-device correctness gate, part (a): kernel bitwise probe.
    # Runs BEFORE timing so a Mosaic miscompile can never ship behind a
    # good-looking bench number. BENCH_DEVICE_PARITY=0 skips the gate
    # (diagnostic runs only — the driver artifact should carry it).
    device_parity = None
    parity_failed = False
    if os.environ.get("BENCH_DEVICE_PARITY", "1") != "0":
        print(
            "bench: on-device kernel parity probe (Pallas-TPU vs XLA-CPU, "
            "both tie modes + heapq oracle)...",
            file=_sys.stderr,
            flush=True,
        )
        # Fail-open on INFRASTRUCTURE errors (a probe crash — e.g. CPU
        # OOM compiling the reference DP — must not cost the run its
        # benchmark record), fail-closed on actual mismatches: a probe
        # that RUNS and disagrees still exits 1 below. One retry before
        # surrendering to ok=null (VERDICT r4 #6): a transient tunnel
        # hiccup should not leave the canonical artifact with parity
        # UNKNOWN.
        device_parity = run_kernel_probe_with_retry(
            lambda: device_parity_kernel_probe(accel),
            log=lambda msg: print(
                f"bench: {msg}", file=_sys.stderr, flush=True
            ),
        )
        print(
            f"bench: kernel probe {device_parity}",
            file=_sys.stderr,
            flush=True,
        )

    print(
        f"bench: compiling + timing the {tie_parity}-tie pipeline...",
        file=_sys.stderr,
        flush=True,
    )
    t_headline0 = time.time()
    module, loop_factory = build_pipeline(
        "float32", "auto", K_ITERS, mode="s2d", tie_parity=tie_parity
    )
    tp_accel = time_loop(module, loop_factory, accel, images_np, K_ITERS)
    t_headline = time.time() - t_headline0
    alt_parity = "exact" if tie_parity == "fast" else "fast"
    tp_alt = None
    # The remote compiler has a degraded mode where big compiles take
    # 15-20 min (PLAN.md r3 gotcha). Budgets are PER PHASE (VERDICT r4
    # #2: r4's total-elapsed guard let slow PROBE compiles skip the
    # disclosed exact-tie measurement): the alt mode is skipped only
    # when the HEADLINE phase itself — whose compile cost predicts the
    # alt phase's (same conv stack, one extra kernel body) — blew the
    # budget; the much more expensive train phase keeps its own
    # total-elapsed guard below, so a degraded window can only cost the
    # train phase, never a disclosed inference mode.
    alt_budget = float(os.environ.get("BENCH_ALT_BUDGET_S", "900"))
    if os.environ.get("BENCH_SKIP_ALT", "0") == "1":
        pass
    elif t_headline > alt_budget:
        print(
            f"bench: headline phase alone took {t_headline:.0f}s "
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

    # --- Train phase (BASELINE config #3 in the driver artifact) +
    # correctness gate part (b): the briefly-trained checkpoint feeds
    # the full-pipeline device-vs-CPU boundary-MAE probe. Budget-guarded
    # like the alt mode; BENCH_TRAIN=0 skips both.
    train_detail = None
    train_budget = float(os.environ.get("BENCH_TRAIN_BUDGET_S", "1500"))
    if os.environ.get("BENCH_TRAIN", "1") == "0":
        pass
    elif time.time() - t_start > train_budget:
        print(
            f"bench: {time.time() - t_start:.0f}s elapsed (degraded "
            "compile window?); skipping the train phase + pipeline "
            "parity probe",
            file=_sys.stderr,
            flush=True,
        )
    else:
        try:
            tp_train, trained_vars = train_brief_and_measure(accel)
            train_detail = {"bscans_per_s": round(tp_train, 3)}
        except Exception as exc:  # noqa: BLE001 — fail-open, disclosed
            trained_vars = None
            train_detail = {"error": repr(exc)}
            print(
                f"bench: train phase CRASHED ({exc!r}); recording the "
                "error and continuing",
                file=_sys.stderr,
                flush=True,
            )
        if device_parity is not None and trained_vars is not None:
            print(
                "bench: pipeline parity probe (device fast s2d vs "
                "CPU-f32 parity pipeline)...",
                file=_sys.stderr,
                flush=True,
            )
            try:
                mae_px, div_frac = pipeline_parity_probe(accel, trained_vars)
            except Exception as exc:  # noqa: BLE001
                device_parity["pipeline_probe_error"] = repr(exc)
                print(
                    f"bench: pipeline parity probe CRASHED ({exc!r}); "
                    "recording the error and continuing",
                    file=_sys.stderr,
                    flush=True,
                )
            else:
                device_parity["pipeline_mae_px"] = round(mae_px, 5)
                device_parity["pipeline_divergent_col_frac"] = round(
                    div_frac, 5
                )
                print(
                    f"bench: pipeline probe MAE {mae_px:.5f} px "
                    f"({div_frac:.4%} cols)",
                    file=_sys.stderr,
                    flush=True,
                )

    if device_parity is not None:
        parity_failed = parity_verdict(device_parity)

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

    if train_detail is not None and "bscans_per_s" in train_detail:
        tp_train_ref = measure_reference_train_keras_cpu_cached()
        train_detail["reference_keras_cpu_train_bscans_per_s"] = (
            round(tp_train_ref, 5) if np.isfinite(tp_train_ref) else None
        )
        train_detail["vs_baseline"] = (
            round(train_detail["bscans_per_s"] / (10.0 * tp_train_ref), 3)
            if np.isfinite(tp_train_ref)
            else None
        )
        train_detail["config"] = (
            "BASELINE #3: batch-8 512x1024 U-Net fwd+bwd+update, "
            "focal_dice, bf16 s2d forward; 10 real dispatches after 2 "
            "compile/warmup steps"
        )

    # MFU disclosure: conv-stack forward FLOPs over FULL-pipeline wall
    # time (min-path + conversions included in the denominator, so this
    # UNDERSTATES pure conv MFU; per-conv rates are in PLAN.md).
    achieved_tf_s = MODEL_FWD_TFLOPS_BATCH8 * tp_accel / BATCH
    mfu = {
        "model_tflops_fwd_batch8": MODEL_FWD_TFLOPS_BATCH8,
        "achieved_tf_s": round(achieved_tf_s, 2),
        "mfu_pct_of_bf16_peak": round(
            100.0 * achieved_tf_s / BF16_PEAK_TFLOPS, 2
        ),
        "definition": "s2d conv-stack forward FLOPs / full-pipeline time "
        f"/ {BF16_PEAK_TFLOPS:.0f} TF/s v5e bf16 peak",
    }

    tie_modes = {
        tie_parity: round(tp_accel, 3),
        alt_parity: round(tp_alt, 3) if tp_alt is not None else None,
    }

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
                    # Stable schema: both modes always present (one may
                    # be null), keyed by mode name.
                    "tie_modes_bscans_per_s": tie_modes,
                    "device_parity": device_parity,
                    "train": train_detail,
                    "mfu": mfu,
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
    if parity_failed:
        print(
            "bench: DEVICE PARITY FAILED — see detail.device_parity",
            file=_sys.stderr,
            flush=True,
        )
        import sys

        sys.exit(1)


if __name__ == "__main__":
    main()
