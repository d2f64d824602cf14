"""Golden-file regression tests (SURVEY.md §4): a fixed-seed model over a
fixed synthetic dataset must keep producing byte-identical delineations
and boundary-map statistics. Goldens are generated on the CPU backend
(the test platform), guarding the full fused pipeline against silent
numerical or tie-breaking regressions.

Regenerate after an *intentional* change with:
    GOLDEN_REGEN=1 python -m pytest tests/test_goldens.py
"""

import json
from pathlib import Path

import jax
import numpy as np

from oct_image_segmentation_models_tpu.models import get_model_class
from oct_image_segmentation_models_tpu.ops import boundary as bops
from oct_image_segmentation_models_tpu.ops import minpath as mops

from synth import make_layered_sample

GOLDEN_PATH = Path(__file__).parent / "goldens" / "pipeline_golden.json"


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
    import os

    if os.environ.get("GOLDEN_REGEN") == "1" or not GOLDEN_PATH.exists():
        GOLDEN_PATH.parent.mkdir(exist_ok=True)
        GOLDEN_PATH.write_text(json.dumps(_compute(), indent=1))
    golden = json.loads(GOLDEN_PATH.read_text())
    got = _compute()
    assert got["labels_sum"] == golden["labels_sum"]
    assert got["maps_nonzero"] == golden["maps_nonzero"]
    assert got["maps_sum"] == golden["maps_sum"]
    assert got["delineations"] == golden["delineations"]
    assert got["delineations_fast"] == golden["delineations_fast"]
    assert got["masks_sum"] == golden["masks_sum"]
    assert abs(got["probs_mean"] - golden["probs_mean"]) < 2e-6

