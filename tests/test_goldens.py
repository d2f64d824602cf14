"""Golden-file regression tests (SURVEY.md §4): a fixed-seed model over a
fixed synthetic dataset must keep producing byte-identical delineations
and boundary-map statistics. Goldens are generated on the CPU backend
(the test platform), guarding the full fused pipeline against silent
numerical or tie-breaking regressions.

Regenerate after an *intentional* change with:
    GOLDEN_REGEN=1 python -m pytest tests/test_goldens.py
"""

import json
import os
from pathlib import Path

import jax
import numpy as np

from oct_image_segmentation_models_tpu.models import get_model_class
from oct_image_segmentation_models_tpu.ops import boundary as bops
from oct_image_segmentation_models_tpu.ops import minpath as mops

from synth import make_layered_sample

GOLDEN_DIR = Path(__file__).parent / "goldens"
GOLDEN_PATH = GOLDEN_DIR / "pipeline_golden.json"


def _check_golden(path: Path, compute, float_keys=()):
    """Compare ``compute()`` against the stored golden (regenerating it
    under GOLDEN_REGEN=1 or on first run); ``float_keys`` compare with a
    2e-6 tolerance, everything else must be exactly equal."""
    if os.environ.get("GOLDEN_REGEN") == "1" or not path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        path.write_text(json.dumps(compute(), indent=1))
    golden = json.loads(path.read_text())
    got = compute()
    assert set(got) == set(golden), (set(got), set(golden))
    for key, val in got.items():
        if key in float_keys:
            assert abs(val - golden[key]) < 2e-6, (key, val, golden[key])
        else:
            assert val == golden[key], key


def _tiny_images(n, h, w, c, seed=42):
    rng = np.random.default_rng(seed)
    return np.stack(
        [make_layered_sample(rng, h, w, c)[0] for _ in range(n)]
    )[..., None]


def _compute():
    rng = np.random.default_rng(42)
    h, w, c = 64, 96, 4
    images = np.stack(
        [make_layered_sample(rng, h, w, c)[0] for _ in range(4)]
    )[..., None]

    container = get_model_class("unet")(
        input_channels=1,
        num_classes=c,
        image_height=h,
        image_width=w,
        start_neurons=4,
        pool_layers=3,
    )
    module = container.build_model()
    variables = module.init(
        jax.random.PRNGKey(1234),
        np.zeros((1, h, w, 1), np.float32),
        training=False,
    )

    probs = module.apply(variables, images / 255.0, training=False)
    labels, categorical = bops.perform_argmax(probs)
    maps = bops.boundary_prob_maps(categorical)
    delins = mops.delineate_image_maps(maps, backend="xla")
    delins_fast = mops.delineate_image_maps(
        maps, backend="xla", tie_parity="fast"
    )
    masks = bops.create_area_mask(
        np.asarray(delins).astype(np.float32), h
    )

    return {
        "labels_sum": int(np.asarray(labels, np.int64).sum()),
        "maps_nonzero": int((np.asarray(maps) > 0).sum()),
        "maps_sum": int(np.asarray(maps, np.int64).sum()),
        "delineations": np.asarray(delins).tolist(),
        "delineations_fast": np.asarray(delins_fast).tolist(),
        "masks_sum": int(np.asarray(masks, np.int64).sum()),
        "probs_mean": round(float(np.asarray(probs).mean()), 6),
    }


def test_pipeline_matches_golden():
    _check_golden(GOLDEN_PATH, _compute, float_keys=("probs_mean",))


def _tiny_unet(h, w, c, start_neurons=4, pool_layers=3):
    container = get_model_class("unet")(
        input_channels=1,
        num_classes=c,
        image_height=h,
        image_width=w,
        start_neurons=start_neurons,
        pool_layers=pool_layers,
    )
    module = container.build_model()
    variables = module.init(
        jax.random.PRNGKey(1234),
        np.zeros((1, h, w, 1), np.float32),
        training=False,
    )
    return container, module, variables


def _compute_fused_fast_ties():
    """The FUSED pipeline (one jit end-to-end, the bench/serving path)
    with the workflow-default tie_parity="fast"."""
    from oct_image_segmentation_models_tpu.ops.inference import (
        make_fused_pipeline,
        select_optimized_forward,
    )

    h, w, c = 64, 96, 4
    images = _tiny_images(4, h, w, c)
    container, module, variables = _tiny_unet(h, w, c)
    labels_fn, apply_fn, fwd_vars, kind, _div = select_optimized_forward(
        module, variables, container.get_config()
    )
    assert kind == "s2d"  # tiny config must stay s2d-eligible
    pipeline = make_fused_pipeline(
        module,
        container.get_preprocess_input_fn(),
        minpath_tie_parity="fast",
        apply_fn=apply_fn,
        labels_apply_fn=labels_fn,
        num_classes=c,
    )
    labels, maps, delins = pipeline(fwd_vars, images)
    return {
        "labels_sum": int(np.asarray(labels, np.int64).sum()),
        "maps_sum": int(np.asarray(maps, np.int64).sum()),
        "delineations": np.asarray(delins).tolist(),
    }


def test_fused_pipeline_fast_ties_matches_golden():
    _check_golden(
        GOLDEN_DIR / "fused_fast_golden.json", _compute_fused_fast_ties
    )


def _compute_bf16():
    """s2d U-Net fused pipeline with compute_dtype="bfloat16" (the
    serving dtype knob; VERDICT r2 golden-coverage item)."""
    from oct_image_segmentation_models_tpu.ops.inference import (
        make_fused_pipeline,
        select_optimized_forward,
    )

    h, w, c = 64, 96, 4
    images = _tiny_images(4, h, w, c, seed=7)
    container, module, variables = _tiny_unet(h, w, c)
    labels_fn, apply_fn, fwd_vars, kind, _div = select_optimized_forward(
        module, variables, container.get_config(), compute_dtype="bfloat16"
    )
    assert kind == "s2d"
    pipeline = make_fused_pipeline(
        module,
        container.get_preprocess_input_fn(),
        minpath_tie_parity="fast",
        apply_fn=apply_fn,
        labels_apply_fn=labels_fn,
        num_classes=c,
    )
    labels, maps, delins = pipeline(fwd_vars, images)
    return {
        "labels_sum": int(np.asarray(labels, np.int64).sum()),
        "maps_sum": int(np.asarray(maps, np.int64).sum()),
        "delineations": np.asarray(delins).tolist(),
    }


def test_bf16_pipeline_matches_golden():
    _check_golden(GOLDEN_DIR / "bf16_pipeline_golden.json", _compute_bf16)


def _compute_deeplab():
    """DeepLabV3+ BN-folded fused pipeline (the serving path for the
    second model family)."""
    from oct_image_segmentation_models_tpu.ops.inference import (
        make_fused_pipeline,
        select_optimized_forward,
    )

    h, w, c = 64, 64, 4
    gray = _tiny_images(2, h, w, c, seed=11)
    images = np.repeat(gray, 3, axis=-1)  # fixed 3-channel input
    container = get_model_class("deeplabv3plus")(
        input_channels=3,
        num_classes=c,
        image_height=h,
        image_width=w,
    )
    module = container.build_model()
    variables = module.init(
        jax.random.PRNGKey(99),
        np.zeros((1, h, w, 3), np.float32),
        training=False,
    )
    labels_fn, apply_fn, fwd_vars, kind, _div = select_optimized_forward(
        module, variables, container.get_config()
    )
    assert kind == "folded"
    pipeline = make_fused_pipeline(
        module,
        container.get_preprocess_input_fn(),
        minpath_tie_parity="fast",
        apply_fn=apply_fn,
        labels_apply_fn=labels_fn,
        num_classes=c,
    )
    labels, maps, delins = pipeline(fwd_vars, images)
    return {
        "labels_sum": int(np.asarray(labels, np.int64).sum()),
        "maps_sum": int(np.asarray(maps, np.int64).sum()),
        "delineations": np.asarray(delins).tolist(),
    }


def test_deeplab_pipeline_matches_golden():
    _check_golden(GOLDEN_DIR / "deeplab_pipeline_golden.json", _compute_deeplab)


def _compute_streaming():
    """VolumeSegmenter end-to-end (streaming serving surface) with its
    defaults — guards the default tie mode + s2d selection + batching
    remainder handling in one golden."""
    from oct_image_segmentation_models_tpu.common.model_io import LoadedModel
    from oct_image_segmentation_models_tpu.prediction.streaming import (
        VolumeSegmenter,
    )

    h, w, c = 64, 96, 4
    volume = _tiny_images(10, h, w, c, seed=3)  # 10 = 2 full + remainder
    container, module, variables = _tiny_unet(h, w, c)
    loaded = LoadedModel("unet", module, variables, container.get_config())
    seg = VolumeSegmenter(loaded, container.get_config(), batch_size=4)
    labels, rows = seg.segment_volume(volume)
    assert labels.shape == (10, h, w) and rows.shape[0] == 10
    return {
        "labels_sum": int(np.asarray(labels, np.int64).sum()),
        "rows": np.asarray(rows).tolist(),
    }


def test_streaming_matches_golden():
    _check_golden(GOLDEN_DIR / "streaming_golden.json", _compute_streaming)

