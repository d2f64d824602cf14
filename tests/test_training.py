"""End-to-end training smoke tests on synthetic data (8 virtual devices)."""

import json

import h5py
import jax
import numpy as np
import pytest

from oct_image_segmentation_models_tpu.training import TrainingParams, train_model

from synth import make_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    return make_dataset(tmp_path_factory.mktemp("data") / "ds.hdf5")


def _params(dataset, tmp_path, **kw):
    defaults = dict(
        model_architecture="unet",
        training_dataset_path=dataset,
        initial_model=None,
        results_location=tmp_path,
        opt_con="adam",
        opt_params={"learning_rate": 1e-3},
        loss="dice_loss_macro",
        metric="dice_coef_macro",
        epochs=2,
        batch_size=2,
        model_hyperparameters={"start_neurons": 2, "pool_layers": 2},
        seed=0,
    )
    defaults.update(kw)
    return TrainingParams(**defaults)


def test_train_model_end_to_end(dataset, tmp_path):
    folder = train_model(_params(dataset, tmp_path), None)
    assert (folder / "model_config.json").exists()
    assert (folder / "training_params.hdf5").exists()
    assert (folder / "model_final.hdf5").exists()
    assert (folder / "performance_plot.png").exists()
    assert (folder / "mlflow_params.json").exists()
    epochs = sorted(folder.glob("model_epoch*.hdf5"))
    assert epochs, "at least one best checkpoint"
    stats = sorted(folder.glob("stats_epoch*.hdf5"))
    assert len(stats) == 1, "rolling stats keeps only the last epoch"
    with h5py.File(stats[0], "r") as f:
        assert len(f["train_loss"]) == 2
        assert np.isfinite(f["train_loss"][:]).all()
        assert len(f["epoch_time"]) == 2
    cfg = json.loads((folder / "model_config.json").read_text())
    assert cfg["num_classes"] == 3
    assert cfg["start_neurons"] == 2


def test_train_with_augmentations_and_focal(dataset, tmp_path):
    params = _params(
        dataset,
        tmp_path,
        loss="focal_dice_loss",
        metric="dice_coef_micro",
        augmentations=[
            {"name": "flip", "arguments": {"flip_type": "left-right"}},
            {"name": "add_noise",
             "arguments": {"mode": "gaussian", "mean": 0, "variance": 0.01}},
        ],
        aug_mode="all",
        aug_fly=True,
        class_weight="balanced",
        epochs=1,
    )
    folder = train_model(params, None)
    assert (folder / "model_final.hdf5").exists()
    with h5py.File(folder / "training_params.hdf5", "r") as f:
        assert f.attrs["aug_mode"] == b"all"
        assert "aug_1" in f.attrs


def test_training_params_snapshot_unbounded_strings(dataset, tmp_path):
    """String-valued snapshot attrs persist in full: a fixed S-width
    silently truncates at the dtype boundary (numpy str->S cast does not
    raise), and an opt_con without __name__ must record a stable name,
    not a repr with a per-process memory address."""
    import optax

    from oct_image_segmentation_models_tpu.training.training import (
        save_training_params_file,
    )

    long_val = "s" * 300
    params = _params(
        dataset,
        tmp_path,
        opt_con=optax.adam(1e-3),
        opt_params={"schedule_spec": long_val},
    )
    tmp_path.mkdir(exist_ok=True)
    save_training_params_file(
        tmp_path, "summary", {"k": "v"}, "md5", None, "ts", params,
        dict(params.opt_params),
    )
    with h5py.File(tmp_path / "training_params.hdf5", "r") as f:
        assert f.attrs["opt_param: schedule_spec"] == long_val  # plain
            # unicode, matching the reference writer (`training/training.py:128-130`)
        optimizer = f.attrs["optimizer"]
        if isinstance(optimizer, bytes):
            optimizer = optimizer.decode()
        assert "0x" not in optimizer and len(optimizer) < 100


def test_signal_restore_tolerates_c_installed_previous_handler(
    dataset, tmp_path, monkeypatch
):
    """signal.signal() returns None when the previous handler was
    installed from C; the finally-block restore must not pass that None
    back (CPython raises TypeError, masking the run's real outcome)."""
    import signal as signal_module

    calls = []
    real_sig_dfl = signal_module.SIG_DFL

    def fake_signal(sig, handler):
        if handler is None:  # CPython's actual behavior
            raise TypeError(
                "signal handler must be signal.SIG_IGN, SIG_DFL, or a "
                "callable object"
            )
        calls.append((sig, handler))
        return None  # simulate: previous handler was installed from C

    monkeypatch.setattr(signal_module, "signal", fake_signal)
    folder = train_model(
        _params(dataset, tmp_path, epochs=1, train_state_checkpoint=True),
        None,
    )
    assert (folder / "model_final.hdf5").exists()
    restores = [h for _, h in calls[2:]]
    assert len(restores) == 2 and all(h == real_sig_dfl for h in restores)


def test_training_params_snapshot_full_optimizer_config(dataset, tmp_path):
    """The reference records the optimizer's FULL config as
    ``opt_param: <key>`` attrs (`training/training.py:124-130`), not just
    the learning rate; callables (schedules) record their name."""
    folder = train_model(
        _params(
            dataset,
            tmp_path,
            epochs=1,
            opt_params={
                "learning_rate": 1e-3,
                "b1": 0.95,
                "nesterov": False,
                "mu_dtype": "bfloat16",
            },
        ),
        None,
    )
    with h5py.File(folder / "training_params.hdf5", "r") as f:
        assert f.attrs["opt_param: learning_rate"] == pytest.approx(1e-3)
        # user params are canonicalized to the Keras attr names the
        # reference's snapshot uses (b1 -> beta_1), with the factory's
        # remaining defaults filled in — and no stale duplicate keys
        assert f.attrs["opt_param: beta_1"] == pytest.approx(0.95)
        assert "opt_param: b1" not in f.attrs
        assert f.attrs["opt_param: beta_2"] == pytest.approx(0.999)
        assert f.attrs["opt_param: epsilon"] == pytest.approx(1e-7)
        assert not f.attrs["opt_param: nesterov"]
        assert f.attrs["opt_param: mu_dtype"] == "bfloat16"
        # recorded for every aug_mode, incl. "none" (reference
        # `training/training.py:117-118`)
        assert "aug_fly" in f.attrs and "aug_val" in f.attrs


def test_resume_from_checkpoint(dataset, tmp_path):
    folder = train_model(_params(dataset, tmp_path, epochs=1), None)
    resume = _params(
        dataset,
        tmp_path / "resume",
        model_architecture=None,
        initial_model=folder / "model_final.hdf5",
        epochs=1,
    )
    folder2 = train_model(resume, None)
    assert (folder2 / "model_final.hdf5").exists()


def test_training_loss_decreases(dataset, tmp_path):
    folder = train_model(_params(dataset, tmp_path, epochs=8), None)
    stats = sorted(folder.glob("stats_epoch*.hdf5"))
    with h5py.File(stats[-1], "r") as f:
        losses = f["train_loss"][:]
    assert losses[-1] < losses[0], losses


def test_bf16_training_runs(dataset, tmp_path):
    folder = train_model(
        _params(
            dataset,
            tmp_path,
            epochs=1,
            model_hyperparameters={
                "start_neurons": 2,
                "pool_layers": 2,
                "dtype": "bfloat16",
            },
        ),
        None,
    )
    assert (folder / "model_final.hdf5").exists()


def test_deeplab_training_smoke(tmp_path):
    # DeepLabV3+ end-to-end: one epoch on tiny 64x64 inputs (3 channels).
    ds = make_dataset(tmp_path / "rgb.hdf5", n_train=2, n_val=2, n_test=2,
                      h=64, w=64, num_classes=3, seed=3)
    # convert to 3-channel images
    with h5py.File(tmp_path / "rgb.hdf5", "r+") as f:
        for split in ("train", "val", "test"):
            imgs = f[f"{split}_images"][:]
            del f[f"{split}_images"]
            f[f"{split}_images"] = np.repeat(imgs, 3, axis=-1)
    folder = train_model(
        TrainingParams(
            model_architecture="deeplabv3plus",
            training_dataset_path=tmp_path / "rgb.hdf5",
            initial_model=None,
            results_location=tmp_path,
            opt_con="adam",
            loss="dice_loss_macro",
            metric="dice_coef_macro",
            epochs=1,
            batch_size=2,
            seed=0,
        ),
        None,
    )
    assert (folder / "model_final.hdf5").exists()


def test_deeplab_pretrained_backbone_wiring(tmp_path):
    """Training DeepLabV3+ with ``pretrained_weights`` demonstrably starts
    from the file's backbone weights (reference builds its backbone with
    ``weights="imagenet"``, `models/deeplabv3plus.py:91-95`): one epoch at
    learning-rate 0 must leave the imported conv kernel / BN scale intact
    in the final checkpoint."""
    import jax

    from oct_image_segmentation_models_tpu.common import model_io
    from oct_image_segmentation_models_tpu.models import get_model_class

    ds_path = tmp_path / "rgb.hdf5"
    make_dataset(ds_path, n_train=2, n_val=2, n_test=2, h=32, w=32,
                 num_classes=3, seed=3)
    with h5py.File(ds_path, "r+") as f:
        for split in ("train", "val", "test"):
            imgs = f[f"{split}_images"][:]
            del f[f"{split}_images"]
            f[f"{split}_images"] = np.repeat(imgs, 3, axis=-1)

    # Synthetic Keras-format ResNet50 h5 with sentinel conv1 weights,
    # shaped from a freshly-initialised backbone.
    container = get_model_class("deeplabv3plus")(
        input_channels=3, num_classes=3, image_height=32, image_width=32
    )
    module = container.build_model()
    variables = module.init(
        jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32),
        training=False,
    )
    kshape = np.asarray(
        variables["params"]["resnet50"]["conv1_conv"]["kernel"]
    ).shape
    kernel = np.random.default_rng(0).normal(size=kshape).astype(np.float32)
    h5path = tmp_path / "resnet50_imagenet.h5"
    with h5py.File(h5path, "w") as f:
        g = f.create_group("conv1_conv").create_group("conv1_conv")
        g["kernel:0"] = kernel
        b = f.create_group("conv1_bn").create_group("conv1_bn")
        b["gamma:0"] = np.full(kshape[-1], 2.0, np.float32)
        b["beta:0"] = np.zeros(kshape[-1], np.float32)
        b["moving_mean:0"] = np.full(kshape[-1], 0.25, np.float32)
        b["moving_variance:0"] = np.full(kshape[-1], 4.0, np.float32)

    # Direct container hook (fresh container carrying the weights path).
    container = get_model_class("deeplabv3plus")(
        input_channels=3, num_classes=3, image_height=32, image_width=32,
        pretrained_weights=str(h5path),
    )
    out = container.apply_pretrained_weights(dict(variables))
    assert np.allclose(
        np.asarray(out["params"]["resnet50"]["conv1_conv"]["kernel"]), kernel
    )
    assert np.allclose(
        np.asarray(out["batch_stats"]["resnet50"]["conv1_bn"]["var"]), 4.0
    )

    # End-to-end through train_model (lr=0 keeps params frozen).
    folder = train_model(
        TrainingParams(
            model_architecture="deeplabv3plus",
            training_dataset_path=ds_path,
            initial_model=None,
            results_location=tmp_path,
            opt_con="adam",
            opt_params={"learning_rate": 0.0},
            loss="dice_loss_macro",
            metric="dice_coef_macro",
            epochs=1,
            batch_size=2,
            model_hyperparameters={"pretrained_weights": str(h5path)},
            seed=0,
        ),
        None,
    )
    _, _, ckpt_vars, _ = model_io.load_model(folder / "model_final.hdf5")
    assert np.allclose(
        np.asarray(ckpt_vars["params"]["resnet50"]["conv1_conv"]["kernel"]),
        kernel,
    )
    assert np.allclose(
        np.asarray(ckpt_vars["params"]["resnet50"]["conv1_bn"]["scale"]), 2.0
    )


def test_unknown_monitor_name_raises(dataset, tmp_path):
    """An unknown model_save_monitor must fail fast, not silently monitor
    val_loss with a possibly-inverted mode."""
    with pytest.raises(ValueError, match="model_save_monitor"):
        train_model(
            _params(dataset, tmp_path, model_save_monitor=("val_bogus", "max")),
            None,
        )


def test_unknown_monitor_mode_raises(dataset, tmp_path):
    """'Max'/'maximize' must not silently fall into the min branch and
    converge best-checkpoint selection to the worst epoch."""
    with pytest.raises(ValueError, match="model_save_monitor mode"):
        train_model(
            _params(dataset, tmp_path, model_save_monitor=("val_loss", "Max")),
            None,
        )


def test_completed_run_keeps_last_epoch_weights(dataset, tmp_path):
    """Keras 2.9 EarlyStopping restores best weights only when stopping
    actually TRIGGERS (reference `training/training.py:335-342`): a run
    that completes all its epochs finalizes last-epoch weights even with
    restore_best_weights=True."""
    from oct_image_segmentation_models_tpu.common import model_io

    folder = train_model(
        _params(
            dataset,
            tmp_path,
            epochs=2,
            model_save_best=False,
            early_stopping=True,
            patience=50,
            restore_best_weights=True,
        ),
        None,
    )
    _, _, final_vars, _ = model_io.load_model(folder / "model_final.hdf5")
    _, _, last_vars, _ = model_io.load_model(folder / "model_epoch02.hdf5")
    for a, b in zip(
        jax.tree_util.tree_leaves(final_vars),
        jax.tree_util.tree_leaves(last_vars),
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_early_stop_restores_es_best_weights(dataset, tmp_path):
    """When early stopping triggers, the finalized weights must come from
    the early-stopping callback's own best snapshot (val_<metric>/max) —
    not from model_save_monitor's best and not from the last epoch."""
    from oct_image_segmentation_models_tpu.common import model_io
    from oct_image_segmentation_models_tpu.training.training import (
        load_train_state,
        save_train_state,
    )

    part = train_model(
        _params(
            dataset,
            tmp_path / "part",
            epochs=2,
            seed=7,
            train_state_checkpoint=True,
        ),
        None,
    )
    state_file = part / "train_state_latest.npz"
    meta, leaves = load_train_state(state_file)
    # The state tree flattens as sorted dict keys: best | es_best | state.
    # Plant distinct sentinels in the two snapshots so the test can tell
    # WHICH one finalization restored.
    assert jax.tree_util.tree_leaves({"best": 0, "es_best": 1, "state": 2}) \
        == [0, 1, 2]
    _, _, part_vars, _ = model_io.load_model(part / "model_final.hdf5")
    n_snap = len(jax.tree_util.tree_leaves(part_vars))
    leaves = list(leaves)
    for i in range(n_snap):
        leaves[i] = np.full_like(np.asarray(leaves[i]), 0.25)
        leaves[n_snap + i] = np.full_like(
            np.asarray(leaves[n_snap + i]), 0.75
        )
    # rewrite as if the saving epoch's patience check had fired
    meta["epochs_since_improvement"] = 3
    save_train_state(state_file, leaves, meta)

    resumed = train_model(
        _params(
            dataset,
            tmp_path / "resumed",
            model_architecture=None,
            resume_train_state=state_file,
            epochs=10,
            seed=7,
            early_stopping=True,
            patience=3,
            restore_best_weights=True,
            # this test proves WHICH snapshot finalization restored via
            # planted sentinels in every leaf; precise-BN finalization
            # (the default) would recompute the batch_stats leaves from
            # data and destroy the stats sentinels
            bn_precise_stats=False,
        ),
        None,
    )
    _, _, final_vars, _ = model_io.load_model(resumed / "model_final.hdf5")
    for leaf in jax.tree_util.tree_leaves(final_vars):
        arr = np.asarray(leaf)
        assert np.all(arr == np.asarray(0.75, arr.dtype)), (
            "finalization restored the wrong snapshot"
        )


def test_mlflow_model_artifact_round_trip(dataset, tmp_path, monkeypatch):
    """Reference parity (`training/training.py:140-141` autolog +
    `common/utils.py:37-51` run-id load): train with an MLflow tracker,
    then load the model purely by run id and predict. Uses the file-store
    ``fake_mlflow`` stand-in (the real package is not installable here)."""
    import sys

    import fake_mlflow

    from oct_image_segmentation_models_tpu.common import model_io
    from oct_image_segmentation_models_tpu.common.mlflow_parameters import (
        MLflowParameters,
    )

    monkeypatch.setitem(sys.modules, "mlflow", fake_mlflow)
    store = tmp_path / "mlruns"
    store.mkdir()
    folder = train_model(
        _params(dataset, tmp_path, epochs=1),
        MLflowParameters(tracking_uri=str(store), experiment="exp-e2e"),
    )
    run_id = folder.parent.name
    assert run_id, "run folder is nested under the mlflow run id"
    run_dir = store / "exp-e2e" / run_id / "artifacts"
    assert (run_dir / "model" / "model_final.hdf5").exists()
    assert (run_dir / "model" / "data" / "model_config.json").exists()

    loaded, config = model_io.load_model_and_config(
        "model/model_final.hdf5",
        mlflow_tracking_uri=str(store),
        mlflow_run_uuid=run_id,
    )
    assert config["num_classes"] == 3
    probs = loaded.predict(np.zeros((1, 32, 48, 1), np.uint8))
    assert probs.shape == (1, 32, 48, 3)
    assert np.allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


def test_mlflow_run_load_rejects_absolute_model_path(tmp_path, monkeypatch):
    """With ``mlflow_run_uuid``, ``model_path`` must be artifact-relative;
    an absolute path would join into a malformed artifact URI and fail
    with an opaque not-found deep in the store."""
    import sys

    import fake_mlflow

    from oct_image_segmentation_models_tpu.common import model_io

    monkeypatch.setitem(sys.modules, "mlflow", fake_mlflow)
    with pytest.raises(ValueError, match="relative to the run's artifact"):
        model_io.load_model_and_config(
            tmp_path / "model_final.hdf5",
            mlflow_tracking_uri=str(tmp_path),
            mlflow_run_uuid="some-run",
        )


def test_resume_checks_and_restores_extension_hyperparameters(
    dataset, tmp_path
):
    """``get_config()`` keeps reference parity and drops extension knobs
    (e.g. ``dtype``), so resume must (a) reject a run whose
    ``model_hyperparameters`` differ from the checkpoint's and (b) rebuild
    the container with the original knobs — a bfloat16 run must not
    silently resume in float32."""
    hp = {"start_neurons": 2, "pool_layers": 2, "dtype": "bfloat16"}
    part = train_model(
        _params(
            dataset,
            tmp_path / "part",
            epochs=1,
            model_hyperparameters=hp,
            train_state_checkpoint=True,
        ),
        None,
    )
    state_file = part / "train_state_latest.npz"
    assert state_file.exists()

    # dropping the dtype knob on resume is a config mismatch, not a
    # silent float32 continuation
    with pytest.raises(ValueError, match="model_hyperparameters"):
        train_model(
            _params(
                dataset,
                tmp_path / "bad",
                model_architecture=None,
                resume_train_state=state_file,
                epochs=2,
                model_hyperparameters={"start_neurons": 2, "pool_layers": 2},
                train_state_checkpoint=True,
            ),
            None,
        )

    resumed = train_model(
        _params(
            dataset,
            tmp_path / "resumed",
            model_architecture=None,
            resume_train_state=state_file,
            epochs=2,
            model_hyperparameters=hp,
            train_state_checkpoint=True,
        ),
        None,
    )
    assert (resumed / "model_final.hdf5").exists()


def test_resume_run_config_is_address_stable_for_callables(dataset, tmp_path):
    """Callables in opt_params normalize to their qualified name, not
    ``str()`` (which embeds the memory address and can never match across
    processes, spuriously rejecting valid resumes)."""
    from oct_image_segmentation_models_tpu.training.training import (
        _resume_run_config,
    )

    def make_schedule():
        def schedule(step):
            return 1e-3

        return schedule

    cfg_a = _resume_run_config(
        _params(dataset, tmp_path, opt_params={"learning_rate": make_schedule()}),
        "md5",
    )
    cfg_b = _resume_run_config(
        _params(dataset, tmp_path, opt_params={"learning_rate": make_schedule()}),
        "md5",
    )
    assert cfg_a == cfg_b
    assert "0x" not in json.dumps(cfg_a["opt_params"])


def test_resume_run_config_stable_for_optax_transformations(dataset, tmp_path):
    """``opt_con`` may be a ready ``optax.GradientTransformation`` (a
    NamedTuple of closures whose ``str()`` embeds per-process function
    addresses); the projection must match across constructions with the
    same hyperparameters — and still distinguish different rates."""
    import optax

    from oct_image_segmentation_models_tpu.training.training import (
        _resume_run_config,
    )

    def cfg(tx):
        return _resume_run_config(
            _params(dataset, tmp_path, opt_con=tx, opt_params={}), "md5"
        )

    assert cfg(optax.adam(1e-3)) == cfg(optax.adam(1e-3))
    assert cfg(optax.adam(1e-3)) != cfg(optax.adam(1e-4))
    assert "0x7" not in json.dumps(cfg(optax.adam(1e-3))["optimizer"])


def test_resume_run_config_detects_changed_callable_parameters(
    dataset, tmp_path
):
    """The callable projection must include bound data, not just the
    qualified name: two schedules from the same factory with different
    rates (closure cells) or two partials with different keyword args
    must NOT compare equal — that would silently pass the resume
    mismatch check while training a different trajectory."""
    import functools

    from oct_image_segmentation_models_tpu.training.training import (
        _resume_run_config,
    )

    def make_schedule(lr):
        def schedule(step):
            return lr

        return schedule

    def base_schedule(step, lr=1e-3):
        return lr

    def cfg(fn):
        return _resume_run_config(
            _params(dataset, tmp_path, opt_params={"learning_rate": fn}),
            "md5",
        )

    # different closure-captured rates differ; same rate matches
    assert cfg(make_schedule(1e-3)) != cfg(make_schedule(1e-4))
    assert cfg(make_schedule(1e-3)) == cfg(make_schedule(1e-3))
    # different partial bindings differ; same binding matches
    assert cfg(functools.partial(base_schedule, lr=1e-3)) != cfg(
        functools.partial(base_schedule, lr=1e-4)
    )
    assert cfg(functools.partial(base_schedule, lr=1e-3)) == cfg(
        functools.partial(base_schedule, lr=1e-3)
    )
    # and a partial never collapses to the bare function it wraps
    assert cfg(functools.partial(base_schedule)) != cfg(base_schedule)


def test_resume_tolerates_checkpoints_missing_new_config_keys(
    dataset, tmp_path
):
    """A train state written before a run-config key existed must stay
    resumable (the key is skipped with a warning), not become
    permanently rejected by the mismatch check."""
    part = train_model(
        _params(
            dataset, tmp_path / "part", epochs=1, train_state_checkpoint=True
        ),
        None,
    )
    state_file = part / "train_state_latest.npz"
    with np.load(state_file) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        arrays = {k: data[k] for k in data.files if k != "__meta__"}
    # simulate an older checkpoint lacking a newer run-config key
    del meta["run_config"]["model_hyperparameters"]
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(state_file, **arrays)

    resumed = train_model(
        _params(
            dataset,
            tmp_path / "resumed",
            model_architecture=None,
            resume_train_state=state_file,
            epochs=2,
            train_state_checkpoint=True,
        ),
        None,
    )
    assert (resumed / "model_final.hdf5").exists()


def test_resume_rejects_dataset_and_monitor_changes(dataset, tmp_path):
    """The run-config guard must cover the training data identity (the
    restored sample_shuffle permutation is only meaningful against the
    dataset it was drawn from) and the best-checkpoint monitor (the
    restored best_monitor value is only comparable under the same
    quantity and direction)."""
    from synth import make_dataset

    part = train_model(
        _params(
            dataset, tmp_path / "part", epochs=1, train_state_checkpoint=True
        ),
        None,
    )
    state_file = part / "train_state_latest.npz"

    other_dataset = make_dataset(tmp_path / "other.hdf5", seed=1)
    with pytest.raises(ValueError, match="training_dataset_md5"):
        train_model(
            _params(
                dataset,
                tmp_path / "swapped",
                training_dataset_path=other_dataset,
                model_architecture=None,
                resume_train_state=state_file,
                epochs=2,
                train_state_checkpoint=True,
            ),
            None,
        )

    with pytest.raises(ValueError, match="model_save_monitor"):
        train_model(
            _params(
                dataset,
                tmp_path / "monitor",
                model_architecture=None,
                resume_train_state=state_file,
                epochs=2,
                model_save_monitor=("val_loss", "min"),
                train_state_checkpoint=True,
            ),
            None,
        )


def test_resume_run_config_factory_projects_to_legacy_bare_name(
    dataset, tmp_path
):
    """A module-level optimizer factory projects to its bare name: the
    library's ``__defaults__`` are version noise (embedding them would
    falsely reject resume across an optax upgrade with zero trajectory
    change — user hyperparameters travel in ``opt_params``, which stays
    fully checked), and the bare name matches run configs written by
    older framework versions, which stored just ``__name__``."""
    import optax

    from oct_image_segmentation_models_tpu.training.training import (
        _resume_run_config,
    )

    cfg = _resume_run_config(
        _params(dataset, tmp_path, opt_con=optax.adam), "md5"
    )
    assert cfg["optimizer"] == "adam"
    # opt_params remains the user-facing guard for factory kwargs
    a = _resume_run_config(
        _params(dataset, tmp_path, opt_con=optax.adam), "md5"
    )
    b = _resume_run_config(
        _params(
            dataset,
            tmp_path,
            opt_con=optax.adam,
            opt_params={"learning_rate": 1e-4},
        ),
        "md5",
    )
    assert a != b


def test_stable_json_distinguishes_default_repr_object_state(
    dataset, tmp_path
):
    """Objects whose default repr carries no state must not compare
    equal after address scrubbing (fail-open would silently void the
    bitwise-identical-resume guarantee): instance attributes are
    projected instead, hex-literal repr content is preserved, and a
    fully opaque object stays fail-closed."""
    from oct_image_segmentation_models_tpu.training.training import (
        _stable_json,
    )

    class Spec:
        def __init__(self, v):
            self.v = v

    assert _stable_json(Spec(1)) == _stable_json(Spec(1))
    assert _stable_json(Spec(1)) != _stable_json(Spec(2))

    class Flags:
        def __init__(self, f):
            self.f = f

        def __repr__(self):
            return f"Flags(0x{self.f:x})"

    assert _stable_json(Flags(0x10)) != _stable_json(Flags(0x20))

    class Opaque:
        __slots__ = ()

    a, b = Opaque(), Opaque()
    assert _stable_json(a) != _stable_json(b)


def test_stable_json_projects_callable_instance_state(dataset, tmp_path):
    """Callable INSTANCES carry their call-site state in instance
    attributes, not closure cells — a bare class-name projection would
    collapse Sched(1e-3) and Sched(1e-4) and fail open. Bound methods
    project their receiver's state; keyword-only defaults of closures
    are part of a function's bound data."""
    from oct_image_segmentation_models_tpu.training.training import (
        _stable_json,
    )

    class Sched:
        def __init__(self, rate):
            self.rate = rate

        def __call__(self, step):
            return self.rate

        def method(self):
            return self.rate

    assert _stable_json(Sched(1e-3)) == _stable_json(Sched(1e-3))
    assert _stable_json(Sched(1e-3)) != _stable_json(Sched(1e-4))
    assert _stable_json(Sched(1).method) == _stable_json(Sched(1).method)
    assert _stable_json(Sched(1).method) != _stable_json(Sched(2).method)

    def make(rate):
        def sched(step, *, scale=rate):
            return scale

        return sched

    assert _stable_json(make(0.1)) == _stable_json(make(0.1))
    assert _stable_json(make(0.1)) != _stable_json(make(0.2))


def test_resume_config_check_warn_allows_mismatch(dataset, tmp_path):
    """``resume_config_check='warn'`` is the escape hatch for false
    rejections the structural projection can't see through (e.g. a
    library upgrade reshaping optax closures): the mismatch is logged
    and training continues."""
    part = train_model(
        _params(
            dataset, tmp_path / "part", epochs=1, train_state_checkpoint=True
        ),
        None,
    )
    state_file = part / "train_state_latest.npz"

    resumed = train_model(
        _params(
            dataset,
            tmp_path / "resumed",
            model_architecture=None,
            resume_train_state=state_file,
            epochs=2,
            opt_params={"learning_rate": 5e-4},
            resume_config_check="warn",
            train_state_checkpoint=True,
        ),
        None,
    )
    assert (resumed / "model_final.hdf5").exists()

    with pytest.raises(ValueError, match="resume_config_check"):
        _params(dataset, tmp_path, resume_config_check="bogus")


def test_finetune_rejects_structural_hyperparameter_override(
    dataset, tmp_path
):
    """``initial_model`` fine-tuning must not rebuild the architecture
    with hyperparameters that contradict the checkpoint's saved config
    (the loaded weights would not describe the new module); extension
    knobs absent from the saved config remain allowed."""
    folder = train_model(_params(dataset, tmp_path / "base", epochs=1), None)

    with pytest.raises(ValueError, match="conflict.*start_neurons"):
        train_model(
            _params(
                dataset,
                tmp_path / "bad",
                model_architecture=None,
                initial_model=folder / "model_final.hdf5",
                model_hyperparameters={"start_neurons": 4, "pool_layers": 2},
                epochs=1,
            ),
            None,
        )

    # extension knob (not in the saved config) is fine
    ok = train_model(
        _params(
            dataset,
            tmp_path / "ok",
            model_architecture=None,
            initial_model=folder / "model_final.hdf5",
            model_hyperparameters={"dtype": "bfloat16"},
            epochs=1,
        ),
        None,
    )
    assert (ok / "model_final.hdf5").exists()


def test_orbax_checkpoint_and_tensorboard(dataset, tmp_path):
    """Orbax backend writes directory checkpoints that load_model_and_config
    restores; tensorboard=True writes event files."""
    from oct_image_segmentation_models_tpu.common import model_io

    folder = train_model(
        _params(
            dataset,
            tmp_path,
            epochs=1,
            checkpoint_format="orbax",
            tensorboard=True,
        ),
        None,
    )
    final = folder / "model_final.orbax"
    assert final.is_dir()
    loaded, config = model_io.load_model_and_config(final)
    assert loaded.name == "unet"
    images = np.zeros((1, 32, 48, 1), np.uint8)
    probs = loaded.predict(images)
    assert probs.shape == (1, 32, 48, config["num_classes"])
    assert np.allclose(probs.sum(-1), 1, atol=1e-5)
    events = list((folder / "tensorboard").glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0

    # resume from an orbax checkpoint
    folder2 = train_model(
        _params(
            dataset,
            tmp_path / "resume",
            epochs=1,
            model_architecture=None,
            initial_model=str(final),
        ),
        None,
    )
    assert (folder2 / "model_final.hdf5").exists()


def _final_params(folder):
    from oct_image_segmentation_models_tpu.common import model_io

    _, _, variables, _ = model_io.load_model(folder / "model_final.hdf5")
    return jax.tree_util.tree_leaves(variables["params"])


def test_exact_resume_from_train_state(dataset, tmp_path):
    """resume_train_state continues BITWISE-identically: 2 epochs +
    resume for 2 more == 4 uninterrupted epochs (same weights, same
    optimizer state trajectory, same per-epoch shuffles and dropout)."""
    full = train_model(
        _params(dataset, tmp_path / "full", epochs=4, seed=11), None
    )

    part = train_model(
        _params(
            dataset,
            tmp_path / "part",
            epochs=2,
            seed=11,
            train_state_checkpoint=True,
        ),
        None,
    )
    state_file = part / "train_state_latest.npz"
    assert state_file.exists()
    resumed = train_model(
        _params(
            dataset,
            tmp_path / "resumed",
            model_architecture=None,
            resume_train_state=state_file,
            epochs=4,
            seed=11,
            train_state_checkpoint=True,
        ),
        None,
    )

    for a, b in zip(_final_params(full), _final_params(resumed)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # The resumed run continues the epoch numbering (3, 4).
    stats = sorted(resumed.glob("stats_epoch*.hdf5"))
    assert stats and stats[-1].name == "stats_epoch04.hdf5"


def test_sigterm_interrupt_saves_and_resumes(dataset, tmp_path):
    """SIGTERM mid-training stops cleanly (final artifacts written) and
    the rolling train-state file resumes the run."""
    import os
    import signal
    import threading
    import time

    run_dir = tmp_path / "interrupted"

    def fire_when_epoch2_done():
        deadline = time.time() + 120
        while time.time() < deadline:
            # rolling stats live at <results_location>/<ts>_unet/
            # (one level; a deeper glob here silently never fired and
            # the test passed only when early stopping kicked in first)
            runs = list(run_dir.glob("*/stats_epoch*.hdf5"))
            if any(int(p.name[len("stats_epoch"):-len(".hdf5")]) >= 2
                   for p in runs):
                os.kill(os.getpid(), signal.SIGTERM)
                return
            time.sleep(0.05)

    t = threading.Thread(target=fire_when_epoch2_done, daemon=True)
    t.start()
    folder = train_model(
        _params(
            dataset,
            run_dir,
            epochs=500,
            seed=3,
            train_state_checkpoint=True,
        ),
        None,
    )
    t.join(timeout=5)
    # Stopped early but finalized: final checkpoint + rolling train state.
    assert (folder / "model_final.hdf5").exists()
    # The interrupted run skips precise-BN finalization (grace-period
    # policy) — the artifact must record the APPLIED semantics, not the
    # configured default (r5 review finding: parity comparisons read
    # this attr).
    with h5py.File(folder / "training_params.hdf5", "r") as f:
        assert bool(f.attrs["bn_precise_stats"]) is True  # the knob
        assert bool(f.attrs["bn_precise_stats_applied"]) is False
    state_file = folder / "train_state_latest.npz"
    assert state_file.exists()
    from oct_image_segmentation_models_tpu.training.training import (
        load_train_state,
    )

    meta, _ = load_train_state(state_file)
    assert 2 <= meta["epoch"] < 500

    resumed = train_model(
        _params(
            dataset,
            tmp_path / "resume2",
            model_architecture=None,
            resume_train_state=state_file,
            epochs=meta["epoch"] + 1,
            seed=3,
        ),
        None,
    )
    assert (resumed / "model_final.hdf5").exists()
    # The resumed run re-materializes the carried best-on-monitor
    # checkpoint (the interrupted folder's copy kept rolling BN stats;
    # the resumed finalization gives this one precise stats) and its
    # completed finalization records the applied semantics.
    n_best = int(meta["best_ckpt_epoch"])
    assert (resumed / f"model_epoch{n_best:02d}.hdf5").exists()
    with h5py.File(resumed / "training_params.hdf5", "r") as f:
        assert bool(f.attrs["bn_precise_stats_applied"]) is True

    # The run-config guard rejects resume under different hyperparameters
    # (here: a different seed) instead of silently diverging.
    with pytest.raises(ValueError, match="run configuration mismatch"):
        train_model(
            _params(
                dataset,
                tmp_path / "resume_bad",
                model_architecture=None,
                resume_train_state=state_file,
                epochs=meta["epoch"] + 1,
                seed=0,
            ),
            None,
        )


def test_resume_rematerializes_best_checkpoint(dataset, tmp_path):
    """Resume carries the best-on-monitor checkpoint into the new
    results folder and the resumed finalization gives it precise BN
    statistics (r5 review finding: an interrupted run skips the
    precise-BN refresh, so without re-materialization a resumed run in
    which no epoch improves would never refresh — or even contain — the
    selected-best checkpoint)."""
    from oct_image_segmentation_models_tpu.common import model_io
    from oct_image_segmentation_models_tpu.training.training import (
        load_train_state,
    )

    part = train_model(
        _params(
            dataset,
            tmp_path / "p1",
            epochs=2,
            seed=11,
            train_state_checkpoint=True,
        ),
        None,
    )
    state_file = part / "train_state_latest.npz"
    meta, _ = load_train_state(state_file)
    assert meta["best_ckpt_epoch"] is not None
    n = int(meta["best_ckpt_epoch"])
    orig = part / f"model_epoch{n:02d}.hdf5"
    assert orig.exists()

    # Resume with epochs == saved epoch: ZERO further epochs run — the
    # "no post-resume epoch improves" worst case.
    resumed = train_model(
        _params(
            dataset,
            tmp_path / "p2",
            model_architecture=None,
            resume_train_state=state_file,
            epochs=int(meta["epoch"]),
            seed=11,
        ),
        None,
    )
    carried = resumed / f"model_epoch{n:02d}.hdf5"
    assert carried.exists(), (
        "carried best checkpoint not re-materialized in the resumed "
        "folder"
    )
    _, _, v1, _ = model_io.load_model(orig)
    _, _, v2, _ = model_io.load_model(carried)
    # identical weights; precise statistics recomputed over the same
    # data under the same refresh key -> equal (float roundoff only)
    for a, b in zip(
        jax.tree_util.tree_leaves(v1["params"]),
        jax.tree_util.tree_leaves(v2["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(v1["batch_stats"]),
        jax.tree_util.tree_leaves(v2["batch_stats"]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_exact_resume_with_probabilistic_augs(dataset, tmp_path):
    """aug_mode="one" draws per-sample aug choices from the generator's
    RNG stream, and add_noise draws noise values from it; exact resume
    must restore that stream (epoch-count replay alone cannot) for the
    runs to stay bitwise-identical."""
    kw = dict(
        epochs=3,
        seed=5,
        aug_mode="one",
        aug_fly=True,
        # force the HOST aug path: the noise draws must come from the
        # generator's resumable RNG stream, not per-call OS entropy
        aug_device="off",
        augmentations=[
            {"name": "flip", "arguments": {"flip_type": "left-right"}},
            {
                "name": "add_noise",
                "arguments": {"mode": "gaussian", "variance": 0.01},
            },
        ],
    )
    full = train_model(_params(dataset, tmp_path / "full", **kw), None)
    part = train_model(
        _params(
            dataset,
            tmp_path / "part",
            train_state_checkpoint=True,
            **{**kw, "epochs": 1},
        ),
        None,
    )
    resumed = train_model(
        _params(
            dataset,
            tmp_path / "resumed",
            model_architecture=None,
            resume_train_state=part / "train_state_latest.npz",
            **kw,
        ),
        None,
    )
    for a, b in zip(_final_params(full), _final_params(resumed)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_resume_from_early_stopped_state_skips_to_finalization(
    dataset, tmp_path
):
    """A train state whose patience was already exhausted when it was
    saved must resume straight to finalization — the uninterrupted run
    trained no further, so a resumed one must not either."""
    from oct_image_segmentation_models_tpu.training.training import (
        load_train_state,
        save_train_state,
    )

    part = train_model(
        _params(
            dataset,
            tmp_path / "part",
            epochs=2,
            seed=7,
            train_state_checkpoint=True,
        ),
        None,
    )
    state_file = part / "train_state_latest.npz"
    meta, leaves = load_train_state(state_file)
    # Rewrite the state as if the saving iteration's end-of-epoch
    # patience check had fired (preemption between the save and the
    # break). tree_flatten of the leaf list preserves leaf order.
    meta["epochs_since_improvement"] = 3
    save_train_state(state_file, leaves, meta)

    resumed = train_model(
        _params(
            dataset,
            tmp_path / "resumed",
            model_architecture=None,
            resume_train_state=state_file,
            epochs=10,
            seed=7,
            early_stopping=True,
            patience=3,
        ),
        None,
    )
    # Finalized (final checkpoint from the restored best weights) but
    # trained zero extra epochs: no per-epoch stats or checkpoints.
    assert (resumed / "model_final.hdf5").exists()
    assert not list(resumed.glob("stats_epoch*.hdf5"))
    assert not list(resumed.glob("model_epoch*.hdf5"))


def test_train_state_meta_arrays_stored_as_npz(tmp_path):
    """ndarray-valued meta entries (the generators' dataset-sized
    sample_shuffle permutations) are stored as compact npz arrays, not
    JSON-encoded lists, and round-trip exactly."""
    from oct_image_segmentation_models_tpu.training.training import (
        load_train_state,
        save_train_state,
    )

    perm = np.random.default_rng(0).permutation(100_000)
    meta = {
        "epoch": 3,
        "train_gen_state": {
            "rng_state": {"state": 123},
            "sample_shuffle": perm,
            "counters": [1, 2, 3],
        },
        "nested": [{"arr": np.array([1.5, -2.5], np.float64)}],
    }
    tree = {"state": [np.ones((2, 2), np.float32)], "best": np.zeros(3)}
    path = tmp_path / "ts.npz"
    save_train_state(path, tree, meta)

    meta2, leaves = load_train_state(path)
    got = meta2["train_gen_state"]["sample_shuffle"]
    assert isinstance(got, np.ndarray) and got.dtype == perm.dtype
    np.testing.assert_array_equal(got, perm)
    np.testing.assert_array_equal(meta2["nested"][0]["arr"], [1.5, -2.5])
    assert meta2["train_gen_state"]["counters"] == [1, 2, 3]
    assert len(leaves) == 2

    # the embedded JSON blob must stay small — the 100k-entry
    # permutation would be ~700 KB as a JSON list
    with np.load(path) as data:
        assert len(bytes(data["__meta__"])) < 2_000
