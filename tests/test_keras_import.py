"""Importing reference-style Keras U-Net checkpoints into the Flax model."""

import json

import h5py
import jax
import numpy as np

from oct_image_segmentation_models_tpu.common import model_io
from oct_image_segmentation_models_tpu.models import get_model_class


def _make_keras_style_checkpoint(tmp_path, container, variables):
    """Write our init weights in the Keras h5 layout (conv2d_k /
    batch_normalization_k layer groups in creation order)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    blocks = sorted(
        (k for k in params if k.startswith("ConvBlock_")),
        key=lambda k: int(k.split("_")[1]),
    )
    path = tmp_path / "model_epoch03.hdf5"
    with h5py.File(path, "w") as f:
        f.attrs["model_config"] = json.dumps(
            {"class_name": "Functional", "config": {"name": "unet"}}
        )
        root = f.create_group("model_weights")

        def conv_name(i):
            return "conv2d" if i == 0 else f"conv2d_{i}"

        def bn_name(i):
            return (
                "batch_normalization" if i == 0 else f"batch_normalization_{i}"
            )

        for i, block in enumerate(blocks):
            g = root.create_group(conv_name(i)).create_group(conv_name(i))
            g["kernel:0"] = np.asarray(params[block]["Conv_0"]["kernel"])
            g["bias:0"] = np.asarray(params[block]["Conv_0"]["bias"])
            b = root.create_group(bn_name(i)).create_group(bn_name(i))
            b["gamma:0"] = np.asarray(params[block]["BatchNorm_0"]["scale"])
            b["beta:0"] = np.asarray(params[block]["BatchNorm_0"]["bias"])
            b["moving_mean:0"] = np.asarray(
                stats[block]["BatchNorm_0"]["mean"]
            )
            b["moving_variance:0"] = np.asarray(
                stats[block]["BatchNorm_0"]["var"]
            )
        g = root.create_group(conv_name(len(blocks)))
        g = g.create_group(conv_name(len(blocks)))
        g["kernel:0"] = np.asarray(params["Conv_0"]["kernel"])
        g["bias:0"] = np.asarray(params["Conv_0"]["bias"])

    with open(tmp_path / "model_config.json", "w") as fh:
        json.dump(container.get_config(), fh)
    return path


def test_keras_unet_checkpoint_roundtrip(tmp_path):
    container = get_model_class("unet")(
        input_channels=1,
        num_classes=3,
        image_height=16,
        image_width=16,
        start_neurons=2,
        pool_layers=2,
    )
    module = container.build_model()
    rng = np.random.default_rng(0)
    variables = module.init(
        jax.random.PRNGKey(7),
        np.zeros((1, 16, 16, 1), np.float32),
        training=False,
    )
    # perturb batch stats so the import has to carry them
    import flax

    variables = flax.core.unfreeze(variables)
    for block in variables["batch_stats"].values():
        block["BatchNorm_0"]["mean"] = (
            block["BatchNorm_0"]["mean"] + 0.25
        )

    path = _make_keras_style_checkpoint(tmp_path, container, variables)

    loaded, config = model_io.load_model_and_config(path)
    assert loaded.name == "unet"
    assert config["start_neurons"] == 2

    x = rng.integers(0, 255, (2, 16, 16, 1)).astype(np.uint8)
    want = module.apply(variables, x / 255.0, training=False)
    got = loaded.predict(x / 255.0)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_keras_import_requires_sidecar(tmp_path):
    path = tmp_path / "model.hdf5"
    with h5py.File(path, "w") as f:
        f.create_group("model_weights")
    import pytest

    with pytest.raises(FileNotFoundError):
        model_io.load_model_and_config(path)


def test_keras_deeplab_checkpoint_roundtrip(tmp_path):
    """Fabricate a reference-style Keras DeepLabV3+ checkpoint (ResNet50
    layer names for the backbone, creation-order conv2d_k names for the
    head) and import it weight-for-weight."""
    import flax

    container = get_model_class("deeplabv3plus")(
        input_channels=3,
        num_classes=3,
        image_height=64,
        image_width=64,
    )
    module = container.build_model()
    variables = flax.core.unfreeze(
        module.init(
            jax.random.PRNGKey(1),
            np.zeros((1, 64, 64, 3), np.float32),
            training=False,
        )
    )
    rng = np.random.default_rng(3)
    # perturb so every imported tensor differs from a fresh init
    variables = jax.tree_util.tree_map(
        lambda a: np.asarray(a) + rng.normal(0, 0.01, a.shape).astype(a.dtype),
        variables,
    )
    params, stats = variables["params"], variables["batch_stats"]

    path = tmp_path / "model_epoch05.hdf5"
    with h5py.File(path, "w") as f:
        f.attrs["model_config"] = json.dumps(
            {"class_name": "Functional", "config": {"name": "deeplabv3plus"}}
        )
        root = f.create_group("model_weights")

        def write_layer(name, tensors):
            g = root.create_group(name).create_group(name)
            for k, v in tensors.items():
                g[f"{k}:0"] = np.asarray(v)

        for layer_name, target in params["resnet50"].items():
            if "kernel" in target:
                write_layer(
                    layer_name,
                    {"kernel": target["kernel"], "bias": target["bias"]},
                )
            else:
                write_layer(
                    layer_name,
                    {
                        "gamma": target["scale"],
                        "beta": target["bias"],
                        "moving_mean": stats["resnet50"][layer_name]["mean"],
                        "moving_variance": stats["resnet50"][layer_name]["var"],
                    },
                )

        head_blocks = [("DSPP_0", f"_ConvBlock_{i}") for i in range(6)] + [
            (f"_ConvBlock_{i}",) for i in range(3)
        ]
        for i, hpath in enumerate(head_blocks):
            p, b = params, stats
            for part in hpath:
                p, b = p[part], b[part]
            conv = {"kernel": p["Conv_0"]["kernel"]}
            if "bias" in p["Conv_0"]:
                conv["bias"] = p["Conv_0"]["bias"]
            write_layer("conv2d" if i == 0 else f"conv2d_{i}", conv)
            write_layer(
                "batch_normalization"
                if i == 0
                else f"batch_normalization_{i}",
                {
                    "gamma": p["BatchNorm_0"]["scale"],
                    "beta": p["BatchNorm_0"]["bias"],
                    "moving_mean": b["BatchNorm_0"]["mean"],
                    "moving_variance": b["BatchNorm_0"]["var"],
                },
            )
        write_layer(
            "conv2d_9",
            {"kernel": params["Conv_0"]["kernel"], "bias": params["Conv_0"]["bias"]},
        )
    with open(tmp_path / "model_config.json", "w") as fh:
        json.dump(container.get_config(), fh)

    loaded, config = model_io.load_model_and_config(path)
    assert loaded.name == "deeplabv3plus"
    got = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, loaded.variables)
    )
    want = jax.tree_util.tree_leaves(variables)
    assert len(got) == len(want)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_keras_checkpoint_via_mlflow_run(tmp_path, monkeypatch):
    """A reference Keras checkpoint fetched by MLflow run id loads using
    the run's logged config artifact — the downloaded file has no
    model_config.json sidecar next to it (reference
    `common/utils.py:37-51` supports exactly this flow)."""
    import sys

    import fake_mlflow

    container = get_model_class("unet")(
        input_channels=1, num_classes=3, image_height=16, image_width=16,
        start_neurons=2, pool_layers=2,
    )
    module = container.build_model()
    variables = module.init(
        jax.random.PRNGKey(0), np.zeros((1, 16, 16, 1), np.float32),
        training=False,
    )
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    ckpt = _make_keras_style_checkpoint(src_dir, container, variables)

    # lay the artifacts out like an mlflow file store, WITHOUT a sidecar
    # next to the checkpoint
    store = tmp_path / "mlruns"
    art = store / "exp" / "run123" / "artifacts"
    (art / "model" / "data").mkdir(parents=True)
    (art / "model" / "model_final.hdf5").write_bytes(ckpt.read_bytes())
    (art / "model" / "data" / "model_config.json").write_text(
        json.dumps(container.get_config())
    )

    monkeypatch.setitem(sys.modules, "mlflow", fake_mlflow)
    loaded, config = model_io.load_model_and_config(
        "model/model_final.hdf5",
        mlflow_tracking_uri=str(store),
        mlflow_run_uuid="run123",
    )
    assert loaded.name == "unet"
    assert config["num_classes"] == 3
    want = loaded.module.apply(variables, np.zeros((1, 16, 16, 1)),
                               training=False)
    got = loaded.module.apply(loaded.variables, np.zeros((1, 16, 16, 1)),
                              training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_save_model_long_config_round_trips(tmp_path):
    """Checkpoint attrs are sized to their content: a model_config whose
    JSON exceeds the old fixed S10000 width must survive byte-for-byte
    (numpy str->S casts truncate silently)."""
    cfg = {
        "input_channels": 1, "num_classes": 3, "image_height": 16,
        "image_width": 16, "note": "x" * 20000,
    }
    path = tmp_path / "m.hdf5"
    model_io.save_model(
        path, "unet", cfg, {"params": {"w": np.zeros(2, np.float32)}}
    )
    name, loaded_cfg, variables, _ = model_io.load_model(path)
    assert name == "unet"
    assert loaded_cfg == cfg
