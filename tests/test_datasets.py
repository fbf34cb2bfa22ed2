"""Dataset loaders: AAPM split arithmetic, ellipse determinism, presaved
val-set consumption through the factory."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from diffusion_models_dev_project_tpu.data.aapm import AAPMDataset
from diffusion_models_dev_project_tpu.data.ellipses import (
    DiskDistributedEllipsesDataset, rasterize_ellipses, sample_ellipse_params)


def _write_aapm(tmp_path, n=100):
    for i in range(n):
        np.save(tmp_path / f"{i}.0.npy",
                np.full((8, 8), float(i), np.float32))


def test_aapm_split_matches_reference_arithmetic(tmp_path):
    """test = every 8th slice; val = every 40th of the remainder
    (reference aapm.py:24-33)."""
    _write_aapm(tmp_path, 100)
    test = AAPMDataset("test", str(tmp_path))
    val = AAPMDataset("val", str(tmp_path))
    files = sorted(os.listdir(tmp_path), key=lambda n: float(n.split(".")[0]))
    want_test = files[::8]
    want_val = sorted(set(files) - set(want_test),
                      key=lambda n: float(n.split(".")[0]))[::40]
    assert test.slices == want_test
    assert val.slices == want_val
    assert len(test) == 13 and len(val) == 3
    x = test[2]
    assert x.shape == (8, 8, 1) and x.dtype == np.float32
    assert float(x[0, 0, 0]) == 16.0            # 3rd every-8th slice

    # train fold (extension): every non-test slice not in the val fold;
    # the three folds partition the file list
    train = AAPMDataset("train", str(tmp_path))
    assert set(train.slices) == set(files) - set(want_test) - set(want_val)
    assert len(train) == 100 - 13 - 3
    b = next(train.batches(4, augment=True))
    assert b.shape == (4, 8, 8, 1)


def test_ellipse_dataset_deterministic_per_fold():
    a = DiskDistributedEllipsesDataset((32, 32), length=4, fixed_seed=1,
                                       fold="train", max_n_ellipse=20)
    b = DiskDistributedEllipsesDataset((32, 32), length=4, fixed_seed=1,
                                       fold="train", max_n_ellipse=20)
    v = DiskDistributedEllipsesDataset((32, 32), length=4, fixed_seed=1,
                                       fold="validation", max_n_ellipse=20)
    np.testing.assert_array_equal(a[2], b[2])
    assert np.abs(a[0] - v[0]).max() > 1e-6      # folds differ (seed+1)
    img = a[0]
    assert img.shape == (32, 32, 1)
    assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-6


def test_rasterizer_matches_analytic_ellipse():
    """A single axis-aligned ellipse rasterizes to its analytic indicator."""
    p = np.zeros((1, 3, 6), np.float32)
    p[0, 0] = [0.8, 0.5, 0.25, 0.1, -0.2, 0.0]   # v, a1, a2, cx, cy, rot
    img = np.asarray(rasterize_ellipses(jnp.asarray(p), 64))[0, :, :, 0]
    cs = (np.arange(64) + 0.5) / 64 * 2 - 1
    px, py = cs[None, :], -cs[:, None]
    want = (((px - 0.1) / 0.5) ** 2 + ((py + 0.2) / 0.25) ** 2 <= 1.0)
    got = img > 0
    # allow boundary-pixel disagreement only
    assert (got != want).mean() < 0.01


def test_factory_uses_presaved_valset():
    import diffusion_models_dev_project_tpu.factory as F
    from diffusion_models_dev_project_tpu.configs.disk_ellipses_configs import get_config

    config = get_config("vesde")
    config.data.part = "val"
    ds = F.get_standard_dataset(config)
    arr = np.stack([np.asarray(x) for x in ds])
    assert arr.shape == (10, 256, 256, 1)        # the reference's shipped set
    assert 0.0 <= arr.min() and arr.max() <= 1.0 + 1e-6


def test_synth_aapm_generator_feeds_dataset(tmp_path):
    """`scripts/make_synth_aapm.py` output loads through AAPMDataset with
    the reference fold arithmetic and is a valid [0,1] NHWC image source
    (the OOD-matrix eval path, BENCH.md round 3)."""
    import subprocess
    import sys

    out = tmp_path / "aapm"
    subprocess.run([sys.executable, "scripts/make_synth_aapm.py",
                    "--out", str(out), "--n", "16", "--im_size", "32"],
                   check=True, cwd=os.path.dirname(os.path.dirname(__file__)))
    from diffusion_models_dev_project_tpu.data.aapm import AAPMDataset

    test = AAPMDataset(part="test", base_path=str(out))
    assert len(test) == 2                      # every 8th of 16
    x = test[0]
    assert x.shape == (32, 32, 1) and x.dtype == np.float32
    assert 0.0 <= float(x.min()) and float(x.max()) <= 1.0
    assert float(x.max()) > 0.5                # anatomy present, not blank
