"""True multi-process data-parallel training: 2 JAX processes (gloo CPU
collectives), 2 virtual devices each, global batch assembled with
``make_array_from_process_local_data`` and gradients pmean'd across
hosts. Exercises the multi-host branches of ``train_model`` /
``parallel.mesh.shard_batch`` end-to-end."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

from synth import make_dataset

_WORKER = """
import json, sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

coordinator, pid, dataset, outdir = sys.argv[1:5]
pid = int(pid)
jax.distributed.initialize(coordinator, num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert jax.device_count() == 4, jax.devices()

from oct_image_segmentation_models_tpu.training import (
    TrainingParams,
    train_model,
)

params = TrainingParams(
    model_architecture="unet",
    training_dataset_path=dataset,
    initial_model=None,
    results_location=f"{outdir}/proc{pid}",
    opt_con="adam",
    opt_params={"learning_rate": 1e-3},
    loss="dice_loss_macro",
    metric="dice_coef_macro",
    epochs=2,
    batch_size=4,
    model_hyperparameters={"start_neurons": 2, "pool_layers": 2},
    seed=0,
    train_step_impl="shard_map",
)
folder = train_model(params, None)
with open(f"{outdir}/result{pid}.json", "w") as fh:
    json.dump({"folder": str(folder), "pid": pid}, fh)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_training(tmp_path):
    ds = make_dataset(tmp_path / "ds.hdf5", n_train=8, n_val=4, n_test=2,
                      h=16, w=16)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coordinator = f"localhost:{_free_port()}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = (
        str(Path(__file__).resolve().parent.parent)
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, str(pid), str(ds),
             str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outputs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = [
        json.loads((tmp_path / f"result{pid}.json").read_text())
        for pid in range(2)
    ]
    # Only process 0 writes checkpoints and run artifacts.
    folder0 = Path(results[0]["folder"])
    assert (folder0 / "model_final.hdf5").exists()
    assert (folder0 / "model_config.json").exists()
    assert (folder0 / "mlflow_metrics.jsonl").exists()
    assert not Path(results[1]["folder"]).exists()

    # The trained model predicts sane probabilities.
    from oct_image_segmentation_models_tpu.common import model_io

    loaded, config = model_io.load_model_and_config(
        folder0 / "model_final.hdf5"
    )
    probs = loaded.predict(np.zeros((1, 16, 16, 1), np.uint8))
    assert probs.shape[-1] == config["num_classes"]
    assert np.allclose(probs.sum(-1), 1, atol=1e-5)
