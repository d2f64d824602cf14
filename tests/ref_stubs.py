"""Import machinery for running the UPSTREAM reference package in this
environment (used by the end-to-end parity harness).

The reference pins TF 2.9-era deps (`/root/reference/pyproject.toml:25-34`);
this rig has TF 2.21 / Keras 3 and lacks mlflow, focal-loss and
surface-distance.  ``upstream_package()`` installs import-time stand-ins
for exactly those (the code paths the harness drives touch none of them)
and yields the imported upstream modules.  Same stub set as
``test_reference_oracle.py``'s ``ref_common`` fixture, plus an
isinstance-transparent ``keras.engine.functional.Functional`` so
typeguard 2.x can check the reference's def-time return annotation
(`/root/reference/oct_image_segmentation_models/common/utils.py:29`)
against a real Keras-3 model.
"""

from __future__ import annotations

import contextlib
import importlib
import sys
import types

REF_ROOT = "/root/reference"


class _AnyInstanceMeta(type):
    """Stand-in classes that pass every isinstance check (typeguard
    validates the reference's Keras-2-only annotations at call time)."""

    def __instancecheck__(cls, obj):  # noqa: D105
        return True


def _build_stubs():
    import fake_mlflow

    stubs = {
        "mlflow": fake_mlflow,
        "mlflow.exceptions": fake_mlflow.exceptions,
    }
    if "focal_loss" not in sys.modules:
        fl = types.ModuleType("focal_loss")

        class SparseCategoricalFocalLoss:  # import-time stand-in only
            def __init__(self, *args, **kwargs):
                raise NotImplementedError

        fl.SparseCategoricalFocalLoss = SparseCategoricalFocalLoss
        stubs["focal_loss"] = fl
    if "surface_distance" not in sys.modules:
        # Not a dead stub: OUR reimplementation of the DeepMind
        # surface-distance algorithm exposes the package's exact API
        # (common/surface_distance.py — contour-length-weighted
        # distances, hand-verified against worked examples), so the
        # upstream eval driver's ASD/Hausdorff branches RUN and the
        # harness compares them end-to-end. Both sides then share the
        # metric implementation — this proves DRIVER parity for those
        # branches; value parity against the real DeepMind package
        # stays a deploy-time check (it is uninstallable offline).
        from oct_image_segmentation_models_tpu.common import (
            surface_distance as our_sd,
        )

        sd = types.ModuleType("surface_distance")
        for name in (
            "compute_surface_distances",
            "compute_average_surface_distance",
            "compute_robust_hausdorff",
        ):
            setattr(sd, name, getattr(our_sd, name))
        stubs["surface_distance"] = sd
    if "skimage" not in sys.modules:
        try:
            import skimage.util  # noqa: F401 — use the real one if present
        except ImportError:
            # The reference only needs skimage.util.random_noise
            # (`common/augmentation.py:2`), and only ever calls it with
            # mode/mean/var on non-negative [0,1] images
            # (`augmentation.py:93`); our augmentation module replicates
            # THOSE semantics (oracle-tested). Anything outside that
            # envelope (salt/pepper `amount`, `clip`, signed images whose
            # skimage range is [-1,1]) raises instead of silently acting
            # as a wrong oracle.
            from oct_image_segmentation_models_tpu.common.augmentation import (
                _random_noise,
            )

            def random_noise(image, mode="gaussian", seed=None, **kwargs):
                import numpy as np

                unsupported = set(kwargs) - {"mean", "var"}
                if mode not in ("gaussian", "speckle") or unsupported:
                    raise NotImplementedError(
                        f"skimage stub: mode={mode!r} kwargs="
                        f"{sorted(unsupported)} outside the replicated "
                        "envelope (gaussian/speckle with mean/var)"
                    )
                if np.asarray(image).min() < 0:
                    raise NotImplementedError(
                        "skimage stub: signed images clip to [-1,1] in "
                        "real skimage; the replica only handles [0,1]"
                    )
                return _random_noise(
                    image,
                    mode,
                    kwargs.get("mean", 0.0),
                    kwargs.get("var", 0.01),
                    np.random.default_rng(seed),
                )

            sk = types.ModuleType("skimage")
            sku = types.ModuleType("skimage.util")
            sku.random_noise = random_noise
            sk.util = sku
            stubs["skimage"] = sk
            stubs["skimage.util"] = sku
    return stubs


@contextlib.contextmanager
def upstream_package():
    """Yield the imported upstream ``oct_image_segmentation_models``
    package (with prediction/evaluation drivers importable) inside a
    stubbed environment; restores ``sys.path``/``sys.modules``/keras
    attributes on exit."""
    import keras

    stubs = _build_stubs()

    patched_keras_attrs = {}
    if not hasattr(keras.utils, "losses_utils"):
        # Keras 3 dropped keras.utils.losses_utils; the reference reads
        # ReductionV2.AUTO from it (`common/custom_losses.py:109`).
        lu = types.ModuleType("keras.utils.losses_utils")

        class ReductionV2:
            AUTO = "auto"

        lu.ReductionV2 = ReductionV2
        stubs["keras.utils.losses_utils"] = lu
        keras.utils.losses_utils = lu
        patched_keras_attrs["losses_utils"] = (keras.utils, lu)
    if not hasattr(keras, "engine"):
        # Keras 3 dropped keras.engine; the reference annotates
        # load_model_and_config's return with
        # keras.engine.functional.Functional (`common/utils.py:29`) and
        # typeguard isinstance-checks it — hence the any-instance meta.
        eng = types.ModuleType("keras.engine")
        fun = types.ModuleType("keras.engine.functional")

        class Functional(metaclass=_AnyInstanceMeta):
            pass

        fun.Functional = Functional
        eng.functional = fun
        stubs["keras.engine"] = eng
        stubs["keras.engine.functional"] = fun
        keras.engine = eng
        patched_keras_attrs["engine"] = (keras, eng)

    def _evict_upstream():
        # Typeguard evaluates the reference's annotations at DEF time,
        # baking in whatever keras.engine stub was active when the
        # module first imported. Evicting on entry guarantees a fresh
        # import bound to OUR isinstance-transparent Functional even if
        # another test (e.g. test_reference_oracle's ref_common, which
        # uses a plain stub) imported the package first; evicting on
        # exit keeps the favor symmetric. Without this the e2e test is
        # test-order-dependent.
        for name in [
            n
            for n in sys.modules
            if n == "oct_image_segmentation_models"
            or n.startswith("oct_image_segmentation_models.")
        ]:
            del sys.modules[name]

    inserted = []
    for name, mod in stubs.items():
        if name not in sys.modules:
            sys.modules[name] = mod
            inserted.append(name)
    sys.path.insert(0, REF_ROOT)
    _evict_upstream()
    try:
        pkg = importlib.import_module("oct_image_segmentation_models")
        for sub in (
            "common.dataset_loader",
            "common.utils",
            "common.plotting",
            "common.dataset_construction",
            "common.dataset",
            "models",
            "min_path_processing.graph_search",
            "min_path_processing.utils",
            "prediction.prediction",
            "prediction.prediction_parameters",
            "evaluation.evaluation",
            "evaluation.evaluation_parameters",
        ):
            importlib.import_module(f"oct_image_segmentation_models.{sub}")
        yield pkg
    finally:
        sys.path.remove(REF_ROOT)
        _evict_upstream()
        for name in inserted:
            sys.modules.pop(name, None)
        for attr, (owner, val) in patched_keras_attrs.items():
            if getattr(owner, attr, None) is val:
                delattr(owner, attr)
