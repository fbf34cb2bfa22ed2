"""CLI integration: run the coordinators end-to-end at miniature scale."""
import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_conditional_cli_end_to_end(tmp_path, monkeypatch):
    import run_conditional_sampling as cli

    monkeypatch.chdir(tmp_path)
    args = cli.parser.parse_args([
        "--dataset", "ellipses", "--model_learned_on", "ellipses",
        "--method", "dds", "--num_steps", "3", "--num_images", "1",
        "--sde", "vesde", "--im_size", "64", "--num_channels", "64"])
    cli.coordinator(args)
    runs = list((tmp_path / "outputs").rglob("report.yaml"))
    assert len(runs) == 1
    rep = yaml.safe_load(open(runs[0]))
    assert "PSNR" in rep and "SSIM" in rep and rep["method"] == "dds"
    out_dir = runs[0].parent
    assert (out_dir / "recon_0.png").exists()
    blob = np.load(out_dir / "recon_0_info.npz")
    assert blob["recon"].shape == (64, 64)


def test_conditional_cli_shard_images(tmp_path, monkeypatch):
    """--shard_images batches images through one compiled sampler call
    (sharding over the mesh when divisible); last chunk is padded."""
    import run_conditional_sampling as cli

    monkeypatch.chdir(tmp_path)
    args = cli.parser.parse_args([
        "--dataset", "ellipses", "--model_learned_on", "ellipses",
        "--method", "dds", "--num_steps", "3", "--num_images", "3",
        "--shard_images", "2",
        "--sde", "vesde", "--im_size", "64", "--num_channels", "64"])
    cli.coordinator(args)
    runs = list((tmp_path / "outputs").rglob("report.yaml"))
    assert len(runs) == 1
    rep = yaml.safe_load(open(runs[0]))
    assert "PSNR" in rep
    out_dir = runs[0].parent
    for i in range(3):
        assert (out_dir / f"recon_{i}.png").exists()
    assert not (out_dir / "recon_3.png").exists()


def test_train_cli_end_to_end(tmp_path, monkeypatch):
    import run_score_based_models_train as cli

    monkeypatch.chdir(tmp_path)
    args = cli.parser.parse_args([
        "--sde", "vesde", "--train_model_on", "ellipses",
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "2",
        "--im_size", "64", "--num_channels", "64",
        "--base_path", str(tmp_path / "runs")])
    cli.coordinator(args)
    vdir = tmp_path / "runs" / "DiskEllipses" / "vesde" / "version_01"
    assert (vdir / "report.yaml").exists()
    assert (vdir / "train_log.jsonl").exists()
    ckpts = list((vdir / "ckpts").iterdir())
    assert ckpts, "no checkpoint written"


def test_train_cli_run_dir_resume_and_sample_hook(tmp_path, monkeypatch):
    """--run_dir resumes exactly from the latest checkpoint in place, and
    --sample_freq emits unconditional EMA sample grids (reference
    trainer.py:67-104)."""
    import json

    import run_score_based_models_train as cli

    monkeypatch.chdir(tmp_path)
    run_dir = str(tmp_path / "run")
    common = ["--sde", "vesde", "--train_model_on", "ellipses",
              "--steps_per_epoch", "2", "--batch_size", "2",
              "--im_size", "64", "--num_channels", "64",
              "--run_dir", run_dir, "--sample_freq", "1",
              "--val_num_steps", "3"]
    cli.coordinator(cli.parser.parse_args(common + ["--epochs", "1"]))
    samples = list((tmp_path / "run" / "samples").glob("epoch_*.png"))
    assert samples, "no validation sample grid written"

    # second invocation with more epochs resumes (not restarts) in place
    cli.coordinator(cli.parser.parse_args(common + ["--epochs", "2"]))
    steps = [json.loads(l)["step"] for l in
             open(tmp_path / "run" / "train_log.jsonl")
             if json.loads(l)["name"] == "train/loss"]
    assert max(steps) > 2, f"resume did not continue past epoch 1: {steps}"
    assert not (tmp_path / "run" / "version_01").exists()
