"""Multi-host helpers + per-host batch-slice pipeline path.

Real pod execution needs multiple processes; here the per-host slicing is
simulated single-process: Batches/PackedBatches built with explicit
host_slice values must tile exactly into the unsliced global batches."""

import os

import jax
import numpy as np
import pytest

from chexpert_tpu.data import ChexpertIndex, make_synthetic_dataset
from chexpert_tpu.data.packed import PackedBatches, build_packed_cache
from chexpert_tpu.data.pipeline import Batches
from chexpert_tpu.parallel.multihost import (
    create_hybrid_mesh,
    host_batch_slice,
    initialize,
)


def test_initialize_single_process_noop():
    initialize()  # must not raise without a coordinator
    assert jax.process_count() == 1


def test_initialize_raises_when_cluster_configured(monkeypatch):
    """A failed jax.distributed init must RAISE (not degrade to
    single-process) when coordinator env vars show a pod launch was
    intended — otherwise N trainers race on one output_dir behind the
    bypassed primary-only gating (advisor r2, cli/chexpert.py:277)."""
    import chexpert_tpu.parallel.multihost as mh

    def boom(**kwargs):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    # no cluster env, no explicit args -> swallowed (dev/CI single process)
    for v in mh._COORDINATOR_ENV_VARS + mh._NPROC_ENV_VARS:
        monkeypatch.delenv(v, raising=False)
    # single-host values must not count as a cluster (axon dev box sets
    # TPU_WORKER_HOSTNAMES=localhost)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.setenv("SLURM_NTASKS", "1")
    initialize()
    # multi-host values DO count
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        initialize()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    # cluster env present -> must propagate
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        initialize()
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")
    # explicit args -> must propagate
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        initialize(coordinator_address="localhost:1234", num_processes=2,
                   process_id=0)


def test_hybrid_mesh_single_process():
    mesh = create_hybrid_mesh(4, 2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    # host-contiguous device order on the data axis
    procs = [d.process_index for d in mesh.devices.flatten()]
    assert procs == sorted(procs)


def test_host_batch_slice():
    sl = host_batch_slice(64)
    assert sl == slice(0, 64)  # single process owns the whole batch


@pytest.fixture(scope="module")
def mh_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mh_data"))
    make_synthetic_dataset(root, n_train=16, n_valid=10, image_size=32)
    return root


def _tile(batches_per_host, keys=("image", "label", "index", "mask")):
    """Concatenate per-host batch streams back into global batches."""
    out = []
    for parts in zip(*batches_per_host):
        out.append({k: np.concatenate([p[k] for p in parts]) for k in keys})
    return out


def test_batches_host_slices_tile_to_global(mh_data):
    index = ChexpertIndex(mh_data, "valid", download=False)
    kw = dict(batch_size=8, image_size=32, workers=2)
    full = list(Batches(index, **kw))
    halves = [
        list(Batches(index, **kw, host_slice=slice(0, 4))),
        list(Batches(index, **kw, host_slice=slice(4, 8))),
    ]
    assert all(b["image"].shape[0] == 4 for h in halves for b in h)
    for got, want in zip(_tile(halves), full):
        for k in ("image", "label", "index", "mask"):
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    # final partial global batch: padding rows land on the tail host slice
    assert halves[1][-1]["mask"].tolist() == [0, 0, 0, 0]  # 10 = 8 + 2


def test_packed_host_slices_tile_to_global(mh_data):
    index = ChexpertIndex(mh_data, "train", download=False)
    path = build_packed_cache(
        index, os.path.join(mh_data, "mh_cache"), image_size=32, workers=2,
        pack_margin=8,
    )
    kw = dict(batch_size=8, image_size=32, shuffle=True, augment=True, seed=3)
    full = list(PackedBatches(index, path, **kw))
    quarters = [
        list(PackedBatches(index, path, **kw, host_slice=slice(i * 2, i * 2 + 2)))
        for i in range(4)
    ]
    # shuffle order and augment draws are host-independent: slices tile exactly
    for got, want in zip(_tile(quarters), full):
        for k in ("image", "label", "index", "mask"):
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_cli_multihost_flag_wires_mesh_and_slice(mh_data, tmp_path):
    """--multihost in single-process mode: hybrid mesh + full-batch slice."""
    from chexpert_tpu.cli.chexpert import Runner, config_from_args

    cfg = config_from_args([
        "--train", "--multihost", "--data_path", mh_data,
        "--output_dir", str(tmp_path / "out"), "--model", "densenet-tiny",
        "--image_size", "32", "--batch_size", "8", "--compute_dtype",
        "float32", "--data_parallel", "2",
    ])
    runner = Runner(cfg)
    assert runner.host_slice == slice(0, 8)  # 1 process owns the whole batch
    assert dict(runner.mesh.shape) == {"data": 2, "model": 1}
    batch = next(iter(runner.batches(runner.index("valid"), train=False)))
    assert batch["image"].shape[0] == 8


@pytest.mark.slow
def test_two_process_training_matches_single_process(mh_data, tmp_path):
    """REAL multi-process training: two jax.distributed processes (4 virtual
    CPU devices each -> 8 global) drive the CLI with --multihost. The loss
    trajectory must match a single-process 8-device run of the same config,
    and run artifacts must be written exactly once (primary-only writes)."""
    import json
    import socket
    import subprocess
    import sys

    from chexpert_tpu.cli.chexpert import main as chexpert_main

    def losses(outdir):
        recs = [json.loads(l) for l in open(os.path.join(outdir, "scalars.jsonl"))]
        return {r["step"]: r["value"] for r in recs if r.get("tag") == "train_loss"}

    # reference: single-process run over this process's 8 virtual devices
    ref_dir = str(tmp_path / "single")
    rc = chexpert_main([
        "--train", "--data_path", mh_data, "--output_dir", ref_dir,
        "--model", "densenet-tiny", "--image_size", "32",
        "--batch_size", "8", "--n_epochs", "2", "--lr", "1e-2",
        "--log_interval", "1", "--eval_interval", "2",
        "--compute_dtype", "float32", "--data_workers", "2",
    ])
    assert rc in (0, None)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    mh_dir = str(tmp_path / "multi")
    worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(
                   [os.path.dirname(os.path.dirname(__file__))]
                   + os.environ.get("PYTHONPATH", "").split(os.pathsep)))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "2", mh_data, mh_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    ref, mh = losses(ref_dir), losses(mh_dir)
    assert set(mh) == set(ref) and len(ref) >= 4
    for step in ref:
        np.testing.assert_allclose(mh[step], ref[step], rtol=2e-3,
                                   err_msg=f"step {step}")
    # primary-only artifacts: exactly one scalars.jsonl / config / checkpoint
    assert os.path.exists(os.path.join(mh_dir, "config.json"))
    assert os.path.exists(os.path.join(mh_dir, "checkpoint_latest.msgpack"))


def test_host_batch_slice_from_mesh_validates_layout():
    """Mesh-derived slices: correct rows single-process; loud failure when a
    data row would span processes is exercised by construction in the
    two-process test below (mp=2 with 4 devices/host keeps rows host-local)."""
    from chexpert_tpu.parallel.multihost import host_batch_slice_from_mesh

    mesh = create_hybrid_mesh(4, 2)
    assert host_batch_slice_from_mesh(mesh, 32) == slice(0, 32)
    with pytest.raises(AssertionError):
        host_batch_slice_from_mesh(mesh, 30)  # not divisible by data axis


@pytest.mark.slow
def test_two_process_model_parallel_and_ensemble(mh_data, tmp_path):
    """Two processes with a (data=4, model=2) hybrid mesh: trains (exercising
    the mesh-derived host slices and the model-axis replica dedupe in
    _host_rows), then runs the multi-process ENSEMBLE evaluation over the
    tracked best checkpoints — both must exit 0 and produce the artifacts."""
    import json
    import socket
    import subprocess
    import sys

    def spawn(port, outdir, extra):
        worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH=os.pathsep.join(
                       [os.path.dirname(os.path.dirname(__file__))]
                       + os.environ.get("PYTHONPATH", "").split(os.pathsep)))
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(port), str(i), "2", mh_data, outdir]
                + extra,
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for i in range(2)
        ]
        outs = [p.communicate(timeout=900)[0].decode() for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-3000:]

    def port():
        with socket.socket() as s:
            s.bind(("localhost", 0))
            return s.getsockname()[1]

    outdir = str(tmp_path / "mp2")
    spawn(port(), outdir, ["--train", "--n_epochs", "2",
                           "--data_parallel", "4", "--model_parallel", "2"])
    assert os.path.exists(os.path.join(outdir, "checkpoint_latest.msgpack"))
    recs = [json.loads(l) for l in open(os.path.join(outdir, "scalars.jsonl"))]
    assert any(r.get("tag") == "eval_auc_class_0" for r in recs)

    spawn(port(), outdir, ["--evaluate_ensemble",
                           "--restore", os.path.join(outdir, "best_checkpoints"),
                           "--data_parallel", "4", "--model_parallel", "2"])
    assert os.path.exists(os.path.join(outdir, "eval_results_ensemble.json"))
