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
