"""KV logger, reporting, metrics utilities."""
import json
import os
import time

import numpy as np

from diffusion_models_dev_project_tpu.utils import kvlogger
from diffusion_models_dev_project_tpu.utils.metrics import PSNR, SSIM
from diffusion_models_dev_project_tpu.utils.reporting import (
    save_image_png, save_recon_info, write_report)


def test_kvlogger_mean_and_dump(tmp_path):
    log = kvlogger.configure(str(tmp_path), formats=("jsonl", "csv"))
    log.logkv("a", 1.0)
    log.logkv_mean("b", 1.0)
    log.logkv_mean("b", 3.0)
    out = log.dumpkvs()
    assert out == {"a": 1.0, "b": 2.0}
    assert kvlogger.dumpkvs() == {}
    with open(os.path.join(tmp_path, "progress.jsonl")) as f:
        rec = json.loads(f.readline())
    assert rec["a"] == 1.0 and rec["b"] == 2.0


def test_kvlogger_profile(tmp_path):
    log = kvlogger.configure(str(tmp_path))

    @kvlogger.profile
    def slow():
        time.sleep(0.01)

    slow()
    slow()
    out = log.dumpkvs()
    assert out["time/slow"] >= 0.02


def test_reporting_roundtrip(tmp_path):
    img = np.random.default_rng(0).random((8, 8)).astype(np.float32)
    gt = img * 0.5
    save_image_png(tmp_path / "x.png", img)
    save_recon_info(tmp_path / "x.npz", img, gt)
    blob = np.load(tmp_path / "x.npz")
    np.testing.assert_array_equal(blob["recon"], img)
    write_report(tmp_path / "r.yaml", {"PSNR": np.float32(3.0),
                                       "nested": {"x": [np.int64(1)]}})
    import yaml

    rep = yaml.safe_load(open(tmp_path / "r.yaml"))
    assert rep["PSNR"] == 3.0 and rep["nested"]["x"] == [1]


def test_psnr_ssim_conventions():
    gt = np.zeros((32, 32), np.float32)
    gt[8:24, 8:24] = 2.0            # data range 2.0
    noisy = gt + 0.1
    # PSNR = 20 log10(range) - 10 log10(mse); mse = 0.01, range = 2
    want = 20 * np.log10(2.0) - 10 * np.log10(0.01)
    np.testing.assert_allclose(PSNR(noisy, gt), want, rtol=1e-6)
    assert SSIM(gt, gt) > 0.9999


def test_checkpoint_roundtrip_device_agnostic(tmp_path):
    """Orbax save -> template-free restore returns host numpy matching the
    saved TrainState (restores across device types, factory.py:_load_params)."""
    import jax
    import jax.numpy as jnp
    import optax

    from diffusion_models_dev_project_tpu.training.ema import ema_init
    from diffusion_models_dev_project_tpu.training.trainer import TrainState
    from diffusion_models_dev_project_tpu.utils.checkpoint import Checkpointer

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    opt = optax.adam(1e-3)
    state = TrainState(params, opt.init(params), ema_init(params),
                       jnp.asarray(7, jnp.int32))
    ck = Checkpointer(str(tmp_path))
    assert ck.restore() is None                 # empty dir
    ck.save(state, step=7)
    out = ck.restore()
    assert int(np.asarray(out["step"])) == 7
    np.testing.assert_array_equal(out["params"]["w"], np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(out["ema"]["shadow"]["b"], np.ones((3,)))
    assert ck.latest_step() == 7


def test_trainer_resumes_from_checkpoint(tmp_path):
    """Interrupted training resumes exactly: params/EMA/opt/step restored
    (SURVEY.md §5.4 — beyond the reference's weights-only snapshots)."""
    import jax
    import jax.numpy as jnp

    from diffusion_models_dev_project_tpu.ops.sde import VESDE
    from diffusion_models_dev_project_tpu.training.trainer import train_score_model
    from diffusion_models_dev_project_tpu.utils.checkpoint import Checkpointer

    def apply_fn(p, x, t):
        return x * p["w"].reshape(1, 1, 1, 1)

    def batches():
        while True:
            yield jnp.ones((2, 8, 8, 1)) * 0.5

    sde = VESDE(sigma_min=0.01, sigma_max=5.0)
    init = {"w": jnp.zeros((1,))}
    kw = dict(epochs=2, steps_per_epoch=3, lr=1e-2, log_dir=str(tmp_path / "l"),
              seed=1, save_model_every_n_epoch=1)
    ck1 = Checkpointer(str(tmp_path / "ck"))
    s1 = train_score_model(apply_fn, init, sde, batches(), checkpointer=ck1, **kw)
    assert int(s1.step) == 6
    # "crash" and resume with a fresh call: should skip completed epochs
    ck2 = Checkpointer(str(tmp_path / "ck"))
    s2 = train_score_model(apply_fn, init, sde, batches(), checkpointer=ck2, **kw)
    assert int(s2.step) == 6                     # nothing re-run
    np.testing.assert_allclose(np.asarray(s2.params["w"]),
                               np.asarray(s1.params["w"]), rtol=1e-6)
    # extending epochs continues from the checkpoint
    s3 = train_score_model(apply_fn, init, sde, batches(),
                           checkpointer=Checkpointer(str(tmp_path / "ck")),
                           **{**kw, "epochs": 3})
    assert int(s3.step) == 9


def test_trainer_tail_average_export(tmp_path):
    """`avg_tail=K` writes the rolling fp16 average of the last K saved EMA
    shadows (the BENCH.md round-3 snapshot-averaging recipe, in-trainer),
    and the export numerically equals the mean of the saved EMA shadows."""
    import jax
    import jax.numpy as jnp
    import flax

    from diffusion_models_dev_project_tpu.ops.sde import VESDE
    from diffusion_models_dev_project_tpu.training.trainer import train_score_model
    from diffusion_models_dev_project_tpu.utils.checkpoint import Checkpointer

    def apply_fn(p, x, t):
        return x * p["w"].reshape(1, 1, 1, 1)

    def batches():
        while True:
            yield jnp.ones((2, 8, 8, 1)) * 0.5

    sde = VESDE(sigma_min=0.01, sigma_max=5.0)
    log_dir = tmp_path / "l"
    ck = Checkpointer(str(tmp_path / "ck"))
    train_score_model(apply_fn, {"w": jnp.zeros((1,))}, sde, batches(),
                      epochs=3, steps_per_epoch=2, lr=1e-2,
                      log_dir=str(log_dir), seed=1,
                      save_model_every_n_epoch=1, checkpointer=ck,
                      avg_tail=2)
    path = log_dir / "avg_ema_tail.msgpack.npz"
    assert path.exists()
    avg = flax.serialization.msgpack_restore(path.read_bytes())
    assert avg["w"].dtype == np.float16
    # the average must equal the mean of the LAST TWO saved EMA shadows
    shadows = [np.asarray(Checkpointer(str(tmp_path / "ck")).restore(step=s)
                          ["ema"]["shadow"]["w"], np.float64)
               for s in (4, 6)]
    np.testing.assert_allclose(np.asarray(avg["w"], np.float64),
                               np.mean(shadows, axis=0), rtol=1e-2)


def test_trainer_keep_best_probe_export(tmp_path):
    """`probe_hook` scores every save's EMA shadow (and tail average when
    avg_tail is on); the best-so-far weights are exported to
    best_ema.msgpack.npz with provenance, and a resume carries the prior
    best score so a worse later snapshot cannot overwrite the export
    (the round-3 orbax max_to_keep garbage-collection lesson)."""
    import json

    import jax.numpy as jnp
    import flax

    from diffusion_models_dev_project_tpu.ops.sde import VESDE
    from diffusion_models_dev_project_tpu.training.trainer import train_score_model
    from diffusion_models_dev_project_tpu.utils.checkpoint import Checkpointer

    def apply_fn(p, x, t):
        return x * p["w"].reshape(1, 1, 1, 1)

    def batches():
        while True:
            yield jnp.ones((2, 8, 8, 1)) * 0.5

    sde = VESDE(sigma_min=0.01, sigma_max=5.0)
    log_dir = tmp_path / "l"
    scores = iter([3.0, 1.0, 2.0])          # best at the SECOND save
    seen = []

    def probe_hook(weights):
        seen.append(float(np.asarray(weights["w"])[0]))
        return next(scores)

    train_score_model(apply_fn, {"w": jnp.zeros((1,))}, sde, batches(),
                      epochs=3, steps_per_epoch=2, lr=1e-2,
                      log_dir=str(log_dir), seed=1,
                      save_model_every_n_epoch=1,
                      checkpointer=Checkpointer(str(tmp_path / "ck")),
                      probe_hook=probe_hook)
    assert len(seen) == 3
    meta = json.loads((log_dir / "best_ema.json").read_text())
    assert meta["score"] == 1.0 and meta["step"] == 4 and meta["source"] == "ema"
    best = flax.serialization.msgpack_restore(
        (log_dir / "best_ema.msgpack.npz").read_bytes())
    # exported weights are the step-4 EMA shadow (fp16), not the later one
    np.testing.assert_allclose(np.asarray(best["w"], np.float64), seen[1],
                               rtol=1e-2)
    # resume in the same log_dir: a worse probe score cannot overwrite
    train_score_model(apply_fn, {"w": jnp.zeros((1,))}, sde, batches(),
                      epochs=4, steps_per_epoch=2, lr=1e-2,
                      log_dir=str(log_dir), seed=1,
                      save_model_every_n_epoch=1,
                      checkpointer=Checkpointer(str(tmp_path / "ck")),
                      probe_hook=lambda w: 5.0)
    meta = json.loads((log_dir / "best_ema.json").read_text())
    assert meta["score"] == 1.0 and meta["step"] == 4


def test_get_standard_path_conventions():
    """Output-path hyperparameter encoding (reference exp_utils.py:440-478)."""
    import argparse

    from diffusion_models_dev_project_tpu.factory import get_standard_path

    args = argparse.Namespace(
        model_learned_on="ellipses", dataset="aapm", method="dds",
        num_steps=100, cg_iter=5, gamma=0.01, penalty=1.0, stddev=0.05,
        adaptation="lora", dc_type="cg", num_optim_step=10, tv_penalty=1e-6)
    p = str(get_standard_path(args, run_type="dds", data_part="test"))
    assert "ellipses_aapm/test/dds/num_steps=100/cg_iter=5/gamma=0.01" in p
    assert "noise_level=0.05" in p
    p = str(get_standard_path(args, run_type="adapt"))
    assert "adapt/adaptation=lora/dc_type=cg/num_steps=100" in p
    p = str(get_standard_path(args, run_type="naive"))
    assert "naive/num_steps=100/penalty=1.0" in p
