"""Model I/O round-trips, keras weight import, tracking, input pipeline,
streaming inference, and the CLI."""

import json

import h5py
import jax
import numpy as np
import pytest

from oct_image_segmentation_models_tpu.common import model_io
from oct_image_segmentation_models_tpu.models import get_model_class

from synth import make_dataset


def _tiny_model():
    container = get_model_class("unet")(
        input_channels=1,
        num_classes=3,
        image_height=16,
        image_width=16,
        start_neurons=2,
        pool_layers=2,
    )
    module = container.build_model()
    variables = module.init(
        jax.random.PRNGKey(0), np.zeros((1, 16, 16, 1), np.float32),
        training=False,
    )
    return container, module, variables


def test_checkpoint_roundtrip(tmp_path):
    container, module, variables = _tiny_model()
    path = tmp_path / "model_epoch01.hdf5"
    model_io.save_model(
        path,
        "unet",
        container.get_config(),
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
    )
    name, config, loaded, _ = model_io.load_model(path)
    assert name == "unet"
    assert config["num_classes"] == 3
    orig = jax.tree_util.tree_leaves(variables["params"])
    new = jax.tree_util.tree_leaves(loaded["params"])
    assert all(np.array_equal(a, b) for a, b in zip(orig, new))


def test_load_model_and_config_predict(tmp_path):
    container, module, variables = _tiny_model()
    path = tmp_path / "model_final.hdf5"
    model_io.save_model(
        path, "unet", container.get_config(),
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
    )
    loaded, config = model_io.load_model_and_config(path)
    assert loaded.name == "unet"
    assert loaded.output_classes == 3
    probs = loaded.predict(np.zeros((2, 16, 16, 1), np.uint8))
    assert probs.shape == (2, 16, 16, 3)
    assert np.allclose(probs.sum(-1), 1.0, atol=1e-5)

    # A run id without a tracking URI cannot be resolved; silently
    # treating the path as local would fail later with a confusing error.
    with pytest.raises(ValueError, match="mlflow_tracking_uri"):
        model_io.load_model_and_config(path, mlflow_run_uuid="abc123")


def test_keras_resnet50_weight_import(tmp_path):
    from oct_image_segmentation_models_tpu.models.resnet import ResNet50Backbone

    m = ResNet50Backbone()
    variables = m.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3)))
    params = variables["params"]

    # Build a keras-style h5 with one conv + one bn layer
    h5path = tmp_path / "resnet50_weights.h5"
    kshape = np.asarray(params["conv1_conv"]["kernel"]).shape
    kernel = np.random.default_rng(0).normal(size=kshape).astype(np.float32)
    gamma = np.full(64, 2.0, np.float32)
    with h5py.File(h5path, "w") as f:
        g = f.create_group("conv1_conv").create_group("conv1_conv")
        g["kernel:0"] = kernel
        g["bias:0"] = np.zeros(64, np.float32)
        b = f.create_group("conv1_bn").create_group("conv1_bn")
        b["gamma:0"] = gamma
        b["beta:0"] = np.zeros(64, np.float32)
        b["moving_mean:0"] = np.zeros(64, np.float32)
        b["moving_variance:0"] = np.ones(64, np.float32)

    new_params, batch_stats = model_io.load_keras_resnet50_weights(params, h5path)
    assert np.allclose(np.asarray(new_params["conv1_conv"]["kernel"]), kernel)
    assert np.allclose(np.asarray(new_params["conv1_bn"]["scale"]), 2.0)
    assert "conv1_bn" in batch_stats


def test_local_tracker(tmp_path):
    from oct_image_segmentation_models_tpu.common.tracking import get_tracker

    tracker = get_tracker(None)
    tracker.start_run()
    tracker.set_run_folder(tmp_path)
    tracker.log_params({"a": 1})
    tracker.log_metrics({"loss": 0.5}, step=1)
    tracker.log_dict({"k": "v"}, "model/data/model_config.json")
    assert json.loads((tmp_path / "mlflow_params.json").read_text())["a"] == 1
    assert (tmp_path / "mlflow_metrics.jsonl").exists()
    # artifact subpaths are preserved (MLflow layout): same-named files
    # under different directories must not overwrite each other
    assert (tmp_path / "model/data/model_config.json").exists()
    tracker.log_dict({"k": "other"}, "eval/model_config.json")
    assert json.loads(
        (tmp_path / "model/data/model_config.json").read_text()
    )["k"] == "v"


def test_get_tracker_mlflow_auth_failure_exits(monkeypatch, tmp_path):
    """An MlflowException at tracker construction (wrong credentials /
    unreachable server) raises a catchable TrackingConnectionError with
    the credential hint (the CLI maps it to exit 1) instead of killing
    the embedding interpreter — reference `training/training.py:148-162`
    calls sys.exit inline."""
    import sys

    import fake_mlflow

    from oct_image_segmentation_models_tpu.common import tracking
    from oct_image_segmentation_models_tpu.common.mlflow_parameters import (
        MLflowParameters,
    )

    monkeypatch.setitem(sys.modules, "mlflow", fake_mlflow)
    monkeypatch.setitem(
        sys.modules, "mlflow.exceptions", fake_mlflow.exceptions
    )

    def boom(name):
        raise fake_mlflow.MlflowException("API request failed: 401")

    monkeypatch.setattr(fake_mlflow, "set_experiment", boom)
    with pytest.raises(tracking.TrackingConnectionError, match="credentials"):
        tracking.get_tracker(
            MLflowParameters(tracking_uri=str(tmp_path), experiment="e")
        )

    from oct_image_segmentation_models_tpu import cli

    def raise_tracking(args):
        raise tracking.TrackingConnectionError("MLflow connection failed")

    monkeypatch.setattr(cli, "cmd_predict", raise_tracking)
    assert (
        cli.main(["predict", "m", "d", "o"]) == 1
    ), "CLI must map TrackingConnectionError to exit code 1"


def test_device_flip_rejects_unknown_flip_type():
    """The device augmenter validates flip_type exactly as the host
    flip_aug does — a typo must not silently train with the wrong
    augmentation (host path raises at the first batch)."""
    from oct_image_segmentation_models_tpu.common.augmentation import (
        flip_aug,
    )
    from oct_image_segmentation_models_tpu.ops import augment

    with pytest.raises(ValueError, match="Unknown flip_type"):
        augment.flip(np.zeros((1, 2, 2, 1)), np.zeros((1, 2, 2, 1)),
                     flip_type="updown")
    with pytest.raises(ValueError, match="Unknown flip_type"):
        augment.build_device_augmenter(
            [(flip_aug, {"flip_type": "updown"})]
        )


def test_sharded_reader_and_prefetch(tmp_path):
    from oct_image_segmentation_models_tpu.parallel.input_pipeline import (
        ShardedHDF5Reader,
        device_prefetch,
        prefetch_to_mesh,
    )
    from oct_image_segmentation_models_tpu.parallel.mesh import create_mesh

    ds = make_dataset(tmp_path / "ds.hdf5", n_train=8, n_val=2, n_test=2)
    # two-process sharding: disjoint strided shards
    r0 = ShardedHDF5Reader(ds, "train", process_index=0, process_count=2)
    r1 = ShardedHDF5Reader(ds, "train", process_index=1, process_count=2)
    i0, l0 = r0.load()
    i1, l1 = r1.load()
    assert i0.shape[0] == i1.shape[0] == 4

    batches = [
        (np.zeros((8, 4, 4, 1), np.float32), np.zeros((8, 4, 4, 1), np.int32))
        for _ in range(3)
    ]
    mesh = create_mesh()
    out = list(prefetch_to_mesh(iter(batches), mesh))
    assert len(out) == 3
    out2 = list(device_prefetch(iter(batches)))
    assert len(out2) == 3

    # A consumer that stops early (interrupt/exception) must unblock the
    # producer thread instead of leaving it parked on the space
    # semaphore holding prefetched device batches.
    import threading
    import time

    n_before = threading.active_count()
    many = iter([batches[0]] * 50)
    gen = prefetch_to_mesh(many, mesh, size=2)
    next(gen)
    gen.close()  # what a `break` in a for-loop does
    deadline = time.time() + 5
    while threading.active_count() > n_before:
        if time.time() > deadline:
            raise AssertionError("prefetch producer thread did not exit")
        time.sleep(0.01)

    # A failing SOURCE (HDF5 read error, device_put during a tunnel
    # outage) must surface on the consumer side — a silently-dead
    # producer would leave the consumer blocked forever.
    def failing_source():
        yield batches[0]
        raise RuntimeError("source died")

    gen = prefetch_to_mesh(failing_source(), mesh, size=2)
    next(gen)
    with pytest.raises(RuntimeError, match="source died"):
        for _ in gen:
            pass


def test_sharded_reader_strided_slice_matches_full_read(tmp_path):
    """The shard is selected inside the h5py read (each host only
    materializes its 1/P of the split) and must equal the strided
    slice of a full read."""
    import h5py

    from oct_image_segmentation_models_tpu.common.dataset_loader import (
        _load_split,
    )
    from oct_image_segmentation_models_tpu.parallel.input_pipeline import (
        ShardedHDF5Reader,
    )

    ds = make_dataset(tmp_path / "ds.hdf5", n_train=9, n_val=2, n_test=2)
    with h5py.File(ds, "r") as f:
        full_images, full_labels = _load_split(f, "train")
    for p in range(3):
        images, labels = ShardedHDF5Reader(
            ds, "train", process_index=p, process_count=3
        ).load()
        np.testing.assert_array_equal(images, full_images[p::3])
        np.testing.assert_array_equal(labels, full_labels[p::3])


def test_build_optimizer_keras_defaults_and_renames():
    """SGD defaults to Keras' 0.01 (not a blanket 1e-3) and Keras
    RMSprop's ``rho`` maps to optax's ``decay``."""
    import optax

    from oct_image_segmentation_models_tpu.parallel.train_step import (
        build_optimizer,
    )

    params = {"w": np.ones(3, np.float32)}
    grads = {"w": np.ones(3, np.float32)}

    sgd = build_optimizer("sgd", {})
    updates, _ = sgd.update(grads, sgd.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.01, rtol=1e-6)

    # Keras-semantics epsilon default (1e-7, not optax's 1e-8)
    rms = build_optimizer("rmsprop", {"rho": 0.5})
    ref = optax.rmsprop(learning_rate=1e-3, decay=0.5, eps=1e-7)
    u1, _ = rms.update(grads, rms.init(params), params)
    u2, _ = ref.update(grads, ref.init(params), params)
    np.testing.assert_array_equal(np.asarray(u1["w"]), np.asarray(u2["w"]))


def test_build_optimizer_uses_keras_epsilon_default():
    """Name-based optimizers must run with Keras's epsilon=1e-7 (the
    reference's keras.optimizers default), not optax's 1e-8 — this is
    actual training numerics, not just the artifact snapshot."""
    import optax

    from oct_image_segmentation_models_tpu.parallel.train_step import (
        build_optimizer,
    )

    params = {"w": np.full(3, 1e-4, np.float32)}
    grads = {"w": np.full(3, 1e-5, np.float32)}  # eps-scale gradients
    adam = build_optimizer("adam", {"learning_rate": 1e-3})
    want = optax.adam(1e-3, eps=1e-7)
    not_want = optax.adam(1e-3, eps=1e-8)
    u, _ = adam.update(grads, adam.init(params), params)
    uw, _ = want.update(grads, want.init(params), params)
    un, _ = not_want.update(grads, not_want.init(params), params)
    np.testing.assert_array_equal(np.asarray(u["w"]), np.asarray(uw["w"]))
    assert not np.array_equal(np.asarray(u["w"]), np.asarray(un["w"]))

    # user overrides still win (optax OR Keras arg names)
    explicit = build_optimizer("adam", {"eps": 1e-8})
    ue, _ = explicit.update(grads, explicit.init(params), params)
    np.testing.assert_array_equal(np.asarray(ue["w"]), np.asarray(un["w"]))


def test_resolved_optimizer_config_canonicalizes_user_params():
    """The artifact snapshot must record the value the optimizer RAN
    with under the Keras attr name — never a stale default next to an
    optax-named duplicate."""
    from oct_image_segmentation_models_tpu.parallel.train_step import (
        resolved_optimizer_config,
    )

    cfg = resolved_optimizer_config("adam", {"b1": 0.95})
    assert cfg["beta_1"] == 0.95
    assert "b1" not in cfg
    assert cfg["beta_2"] == 0.999
    assert cfg["epsilon"] == 1e-7
    assert cfg["learning_rate"] == 1e-3
    # TF 2.9 get_config()["name"] casing, matching the sibling
    # "optimizer" artifact attr (ADVICE r3)
    assert cfg["name"] == "Adam"

    cfg = resolved_optimizer_config("rmsprop", {"decay": 0.5})
    assert cfg["rho"] == 0.5 and "decay" not in cfg
    cfg = resolved_optimizer_config("rmsprop", {"rho": 0.4})
    assert cfg["rho"] == 0.4 and "decay" not in cfg


def test_train_step_honors_custom_mesh_axis_name():
    """Collectives/specs must use the name bound on the mesh —
    create_mesh(axis_name=...) composes with make_train_step."""
    import jax
    import jax.numpy as jnp

    from oct_image_segmentation_models_tpu.parallel.mesh import (
        create_mesh, shard_batch,
    )
    from oct_image_segmentation_models_tpu.parallel.train_step import (
        build_optimizer, create_train_state, make_eval_step, make_train_step,
    )

    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, training=False):
            x = nn.Dense(2)(x)
            return nn.BatchNorm(use_running_average=not training)(x)

    module = Tiny()
    variables = dict(module.init(
        jax.random.PRNGKey(0), np.zeros((1, 3), np.float32), training=False
    ))
    tx = build_optimizer("sgd", {})
    mesh = create_mesh(axis_name="replicas")
    state = create_train_state(variables, tx, mesh)

    def loss_fn(labels, out):
        return jnp.mean((out - labels) ** 2)

    step = make_train_step(
        module, tx, loss_fn, loss_fn, mesh, impl="shard_map"
    )
    n = mesh.devices.size
    images = shard_batch(np.zeros((2 * n, 3), np.float32), mesh)
    labels = shard_batch(np.zeros((2 * n, 2), np.float32), mesh)
    state, loss, metric = step(state, images, labels, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    eval_step = make_eval_step(module, loss_fn, loss_fn, mesh,
                               impl="shard_map")
    loss, metric = eval_step(state, images, labels)
    assert np.isfinite(float(loss))


def test_streaming_volume(tmp_path):
    from oct_image_segmentation_models_tpu.common.model_io import (
        load_model_and_config,
        save_model,
    )
    from oct_image_segmentation_models_tpu.prediction.streaming import (
        VolumeSegmenter,
    )

    container, module, variables = _tiny_model()
    path = tmp_path / "m.hdf5"
    save_model(path, "unet", container.get_config(),
               {"params": variables["params"],
                "batch_stats": variables["batch_stats"]})
    loaded, config = load_model_and_config(path)
    seg = VolumeSegmenter(loaded, config, batch_size=4)
    volume = np.random.default_rng(0).integers(
        0, 255, (10, 16, 16, 1), dtype=np.uint8
    )
    labels, segs = seg.segment_volume(volume)
    assert labels.shape == (10, 16, 16)
    assert segs.shape == (10, 2, 16)

    with pytest.raises(ValueError, match="spatial downsampling"):
        seg.segment_volume(volume[:, :14])

    with pytest.raises(ValueError, match="empty volume"):
        seg.segment_volume(volume[:0])

    # bfloat16 conv stack: same shapes, labels near-identical at tiny size
    seg16 = VolumeSegmenter(
        loaded, config, batch_size=4, compute_dtype="bfloat16"
    )
    l16, s16 = seg16.segment_volume(volume)
    assert l16.shape == labels.shape and s16.shape == segs.shape

    # Data-parallel serving over the 8-device mesh: identical outputs to
    # the single-device pipeline (each shard runs the full chain).
    from oct_image_segmentation_models_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    seg_dp = VolumeSegmenter(loaded, config, batch_size=8, mesh=mesh)
    l_dp, s_dp = seg_dp.segment_volume(volume)
    assert np.array_equal(l_dp, labels)
    assert np.array_equal(s_dp, segs)

    with pytest.raises(ValueError, match="multiple of the mesh"):
        VolumeSegmenter(loaded, config, batch_size=4, mesh=mesh)

    # A non-f32 compute dtype must fail fast when the s2d fast path (the
    # only surface that honors it) is unavailable, not silently run f32.
    with pytest.raises(ValueError, match="compute_dtype"):
        VolumeSegmenter(
            loaded, config, batch_size=4, compute_dtype="bfloat16",
            optimize=False,
        )


def test_cli_evaluate(tmp_path):
    from oct_image_segmentation_models_tpu.cli import main
    from oct_image_segmentation_models_tpu.training import (
        TrainingParams,
        train_model,
    )

    ds = make_dataset(tmp_path / "ds.hdf5", n_train=4, n_val=2, n_test=2,
                      h=16, w=16)
    folder = train_model(
        TrainingParams(
            model_architecture="unet",
            training_dataset_path=ds,
            initial_model=None,
            results_location=tmp_path,
            opt_con="adam",
            loss="dice_loss_macro",
            metric="dice_coef_macro",
            epochs=1,
            batch_size=2,
            model_hyperparameters={"start_neurons": 2, "pool_layers": 2},
            seed=0,
        ),
        None,
    )
    out = tmp_path / "eval_out"
    main([
        "evaluate",
        str(folder / "model_final.hdf5"),
        str(ds),
        str(out),
        "--batch-size", "2",
    ])
    assert (out / "overall_evaluation_results.csv").exists()

    pred_out = tmp_path / "pred_out"
    main([
        "predict",
        str(folder / "model_final.hdf5"),
        str(ds),
        str(pred_out),
        "--graph-search",
        "--batch-size", "2",
    ])
    assert (pred_out / "image_0" / "prediction_info.hdf5").exists()


def test_cli_train(tmp_path):
    from oct_image_segmentation_models_tpu.cli import main

    ds = make_dataset(tmp_path / "ds.hdf5", n_train=4, n_val=2, n_test=2,
                      h=16, w=16)
    config = {
        "model_architecture": "unet",
        "training_dataset_path": str(ds),
        "results_location": str(tmp_path / "runs"),
        "optimizer": "adam",
        "loss": "dice_loss_macro",
        "metric": "dice_coef_macro",
        "epochs": 1,
        "batch_size": 2,
        "model_hyperparameters": {"start_neurons": 2, "pool_layers": 2},
        "seed": 0,
        # full TrainingParams pass-through surface (JSON lists become
        # tuples where the params expect them)
        "model_save_monitor": ["val_loss", "min"],
        "train_forward_impl": "parity",
        "aug_device": "off",
        "tensorboard": False,
        "resume_config_check": "strict",
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))
    main(["train", str(cfg_path)])
    runs = list((tmp_path / "runs").glob("*/model_final.hdf5"))
    assert runs

    # Misspelled config keys fail loudly instead of silently training a
    # long run with defaults (r5 review finding).
    bad = dict(config)
    bad["epoch"] = 3  # typo for "epochs"
    (tmp_path / "bad.json").write_text(json.dumps(bad))
    with pytest.raises(SystemExit, match="unknown config key"):
        main(["train", str(tmp_path / "bad.json")])

    # An explicit --output-dir beats the config file's results_location
    # (it used to be silently ignored when both were present).
    main(["train", str(cfg_path), "--output-dir",
          str(tmp_path / "override")])
    assert list((tmp_path / "override").glob("*/model_final.hdf5"))


def test_loaded_model_predict_chunks(tmp_path):
    container, module, variables = _tiny_model()
    path = tmp_path / "m.hdf5"
    model_io.save_model(path, "unet", container.get_config(),
                        {"params": variables["params"],
                         "batch_stats": variables["batch_stats"]})
    loaded, _ = model_io.load_model_and_config(path)
    images = np.random.default_rng(0).integers(
        0, 255, (5, 16, 16, 1), dtype=np.uint8
    )
    full = loaded.predict(images)
    chunked = loaded.predict(images, batch_size=2)
    assert np.allclose(full, chunked, atol=1e-6)


def test_sharded_reader_remainder(tmp_path):
    from oct_image_segmentation_models_tpu.parallel.input_pipeline import (
        ShardedHDF5Reader,
    )

    ds = make_dataset(tmp_path / "odd.hdf5", n_train=7, n_val=2, n_test=2)
    shards = [
        ShardedHDF5Reader(ds, "train", process_index=i, process_count=3).load()
        for i in range(3)
    ]
    counts = [s[0].shape[0] for s in shards]
    # Every shard trims to floor(7/3)=2 (r5 review finding): unequal
    # shard sizes mean unequal per-host step counts, and the host with
    # the extra sample blocks forever in its train-step collectives —
    # the remainder is dropped, same as the training driver's own shard
    # trim (and the reference's own floor(total/batch) remainder drop,
    # `common/data_generator.py:137`).
    assert counts == [2, 2, 2]
    # disjoint strided shards: no sample appears twice
    first_rows = np.concatenate([s[0][:, 0, 0, 0] for s in shards])
    assert len(first_rows) == 6


def test_streaming_volume_deeplab_folded(tmp_path):
    """DeepLabV3+ goes through the BN-folded fast path in VolumeSegmenter
    (labels match the parity module) and honors compute_dtype."""
    import flax
    import jax

    from oct_image_segmentation_models_tpu.common.model_io import (
        load_model_and_config,
        save_model,
    )
    from oct_image_segmentation_models_tpu.models import get_model_class
    from oct_image_segmentation_models_tpu.prediction.streaming import (
        VolumeSegmenter,
    )

    container = get_model_class("deeplabv3plus")(
        input_channels=3, num_classes=3, image_height=32, image_width=32
    )
    module = container.build_model()
    variables = flax.core.unfreeze(
        module.init(
            jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32),
            training=False,
        )
    )
    path = tmp_path / "dl.hdf5"
    save_model(path, "deeplabv3plus", container.get_config(), variables)
    loaded, config = load_model_and_config(path)

    volume = np.random.default_rng(0).integers(
        0, 255, (4, 32, 32, 3), dtype=np.uint8
    )
    seg = VolumeSegmenter(loaded, config, batch_size=4)
    labels, segs = seg.segment_volume(volume)
    assert labels.shape == (4, 32, 32)
    assert segs.shape == (4, 2, 32)

    # parity (unfolded) pipeline: folding may only flip near-tied pixels
    seg_ref = VolumeSegmenter(loaded, config, batch_size=4, optimize=False)
    labels_ref, _ = seg_ref.segment_volume(volume)
    assert (labels != labels_ref).mean() < 0.01

    # compute_dtype now has an honoring surface for DeepLab — no raise
    seg16 = VolumeSegmenter(
        loaded, config, batch_size=4, compute_dtype="bfloat16"
    )
    l16, s16 = seg16.segment_volume(volume)
    assert l16.shape == labels.shape and s16.shape == segs.shape

    # the staged (per-phase-timed) pipeline makes the same dispatch
    from oct_image_segmentation_models_tpu.ops.inference import StagedPipeline

    staged = StagedPipeline(
        loaded.module,
        loaded.variables,
        get_model_class("deeplabv3plus")(**config).get_preprocess_input_fn(),
        model_config=config,
    )
    assert staged._fold_fn is not None
    staged_off = StagedPipeline(
        loaded.module,
        loaded.variables,
        get_model_class("deeplabv3plus")(**config).get_preprocess_input_fn(),
        model_config=config,
        optimize=False,
    )
    assert staged_off._fold_fn is None
    # ... and the folded forward (weights as jit arguments, not captured
    # constants — PLAN.md's ~100 MB remote-compile limit) matches parity
    probs_fold = np.asarray(staged.predict_probs(volume))
    probs_ref = np.asarray(staged_off.predict_probs(volume))
    assert np.allclose(probs_fold, probs_ref, atol=1e-3)
