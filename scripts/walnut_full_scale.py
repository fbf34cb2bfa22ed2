"""Walnut operator at the REAL protocol scale (VERDICT r1 item 5).

Reference shape (`/root/reference/configs/walnut_configs.py:14-30`,
`src/dataset/walnut_utils.py:1127-1166`): 501^2 slice, angular sub-sampling
1200/20 -> 60 angles, column sub-sampling 768/6 -> 128 cols, i.e. a
(60*128 = 7680) x 251001 sparse system matrix.  The real CWI raw data is not
downloadable here (zero egress), so the measured `scan_geom_corrected.geom`
vectors are replaced by a synthetic circular cone-beam orbit with the CWI
scanner's magnification (SOD 66 mm, SDD 199 mm, 0.1496 mm detector pixels)
— every downstream code path (mask probing, single-pass assembly, `.mat`
round-trip, ELL + dense operators, FDK, DDS) is the production one.

Usage:
  PYTHONPATH=. python scripts/walnut_full_scale.py [--platform cpu]
      [--ckpt <orbax dir> --num_steps 1000 --num_channels 128]

Without --ckpt it validates/benches the operator + FDK; with --ckpt it runs
the full DDS reconstruction at the walnut protocol (gamma=0.01 eta=0.15
cg_iter=5, stddev 0.05).
"""
import argparse
import os
import sys
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None, choices=[None, "cpu"],
                    help="force the CPU backend (default: whatever JAX picks)")
parser.add_argument("--ckpt", default=None, help="orbax checkpoint of a 256^2"
                    " score prior; enables the DDS reconstruction stage")
parser.add_argument("--num_channels", default=128, type=int)
parser.add_argument("--sde", default="vesde", choices=["vesde", "ddpm"],
                    help="prior family for the DDS stage (the ellipses-"
                    "trained 256^2 checkpoint must match)")
parser.add_argument("--num_steps", default=1000, type=int)
parser.add_argument("--eta", default="0.15",
                    help="DDIM eta for the DDS stage; comma-separated list "
                    "runs one reconstruction per value (shared operator)")
parser.add_argument("--gamma", default="0.01",
                    help="DDS gamma; comma-separated list sweeps")
parser.add_argument("--cg_iter", default="5",
                    help="CG iterations per DDS step; comma-separated list "
                    "sweeps (each combo re-jits one scan)")
parser.add_argument("--travel_length", default=1, type=int,
                    help="DDPM time-travel jump length (r3: +0.75 dB on "
                    "ellipses at 10)")
parser.add_argument("--travel_repeat", default=1, type=int)
parser.add_argument("--workdir", default="outputs/walnut_full")
args = parser.parse_args()

import jax  # noqa: E402

if args.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from diffusion_models_dev_project_tpu.physics.cone_beam import circular_cone_vecs  # noqa: E402
from diffusion_models_dev_project_tpu.physics import native  # noqa: E402
from diffusion_models_dev_project_tpu.physics.walnut import (  # noqa: E402
    get_walnut_2d_ray_trafo, load_masked_ray_trafo_matrix, matrix_filename)
from diffusion_models_dev_project_tpu.physics.simulation import simulate  # noqa: E402
from diffusion_models_dev_project_tpu.utils.metrics import PSNR, SSIM  # noqa: E402
from scripts._walnut_common import (  # noqa: E402
    ASS, CSS, PIX, SDD, SOD, walnut_phantom)


def fetch(x):
    return float(jnp.sum(x))  # force a device fetch (relay-safe timing)


def main():
    os.makedirs(args.workdir, exist_ok=True)
    print(f"native C++ assembly available: {native.available()}")
    vecs = circular_cone_vecs(1200, src_radius=SOD, det_radius=SDD - SOD,
                              det_spacing=(PIX, PIX))

    # centered single-slice config for the synthetic circular orbit —
    # rationale in scripts/_walnut_common.py
    from scripts._walnut_common import SLICE_CFG as slice_cfg

    mat_file = os.path.join(args.workdir, matrix_filename(1, 2, ASS, CSS))
    fresh = not os.path.exists(mat_file)
    t0 = time.time()
    rt_ell = get_walnut_2d_ray_trafo(
        args.workdir, walnut_id=1, orbit_id=2, angular_sub_sampling=ASS,
        proj_col_sub_sampling=CSS, new_shape=(256, 256), vecs_all=vecs,
        impl="ell", single_slice_config=slice_cfg)
    t_build = time.time() - t0
    what = "mask probe + single-pass assembly + .mat save" if fresh else \
        ".mat load"
    print(f"[ell] operator built in {t_build:.1f}s ({what})")
    print(f"      im_shape={rt_ell.im_shape} obs_shape={rt_ell.obs_shape} "
          f"model grid={rt_ell.model_im_shape}")
    mat = load_masked_ray_trafo_matrix(mat_file)
    print(f"      matrix {mat.shape}, nnz={mat.nnz} "
          f"({mat.nnz / mat.shape[0]:.0f}/row), "
          f".mat size {os.path.getsize(mat_file) / 1e6:.0f} MB")
    assert mat.shape == (7680, 501 * 501), mat.shape

    t0 = time.time()
    rt_dense = get_walnut_2d_ray_trafo(
        args.workdir, walnut_id=1, orbit_id=2, angular_sub_sampling=ASS,
        proj_col_sub_sampling=CSS, new_shape=(256, 256), vecs_all=vecs,
        impl="dense", single_slice_config=slice_cfg)
    print(f"[dense] model-grid densify in {time.time() - t0:.1f}s "
          f"({rt_dense.matrix.shape}, "
          f"{rt_dense.matrix.size * 4 / 1e9:.2f} GB fp32)")

    # ---- numerics: phantom, observation, FDK --------------------------------
    gt = walnut_phantom(501)
    x_model = jax.image.resize(jnp.asarray(gt)[None, :, :, None],
                               (1, 256, 256, 1), method="nearest")
    gt_model = np.asarray(x_model[0, :, :, 0])
    key = jax.random.PRNGKey(3)
    results = {}
    for name, rt in (("ell", rt_ell), ("dense", rt_dense)):
        obs = simulate(key, x_model, rt, 0.05)        # walnut stddev
        fdk = rt.fbp(obs)
        p = PSNR(np.asarray(fdk[0, :, :, 0]), gt_model)
        s = SSIM(np.asarray(fdk[0, :, :, 0]), gt_model)
        # consistency: forward of GT must dominate the noise
        y0 = rt.apply(x_model)
        snr = float(jnp.linalg.norm(y0) / jnp.linalg.norm(obs - y0))
        print(f"[{name}] FDK: {p:.2f} dB / {s:.4f} SSIM   obs SNR {snr:.1f}")
        results[name] = (obs, fdk, p)

    # cross-impl agreement on the forward
    ya = rt_ell.apply(x_model)
    yb = rt_dense.apply(x_model)
    rel = float(jnp.linalg.norm(ya - yb) / jnp.linalg.norm(ya))
    print(f"ell vs dense forward rel-diff: {rel:.2e}")

    # ---- timing: apply / adjoint / AtA at protocol scale --------------------
    cmp_apply = {}
    for name, rt in (("ell", rt_ell), ("dense", rt_dense)):
        # the trafo must be a jit ARGUMENT: closing over it would bake the
        # (up to 2 GB) matrix into the HLO as a constant, which the TPU
        # relay's remote_compile endpoint rejects (HTTP 413)
        apply_j = jax.jit(lambda rt_, xx: rt_.apply(xx))
        adj_j = jax.jit(lambda rt_, yy: rt_.adjoint(yy))
        y = apply_j(rt, x_model); fetch(y)
        z = adj_j(rt, y); fetch(z)
        n_rep = 20
        t0 = time.time()
        for _ in range(n_rep):
            y = apply_j(rt, x_model)
        fetch(y)
        t_ap = (time.time() - t0) / n_rep
        t0 = time.time()
        for _ in range(n_rep):
            z = adj_j(rt, y)
        fetch(z)
        t_ad = (time.time() - t0) / n_rep
        print(f"[{name}] apply {t_ap * 1e3:.2f} ms, adjoint {t_ad * 1e3:.2f} ms"
              f" (jitted, batch 1, fetch-forced)")
        cmp_apply[name] = t_ap

    # ---- optional: DDS reconstruction at the walnut protocol ----------------
    if args.ckpt:
        import diffusion_models_dev_project_tpu.factory as F
        from diffusion_models_dev_project_tpu.configs.disk_ellipses_configs import (
            get_config)

        # walnut reconstruction uses the ELLIPSES-trained 256^2 prior (the
        # reference's two-axis protocol: --model_learned_on ellipses
        # --dataset walnut); walnut_configs carries no model block.
        config = get_config(args.sde)
        config.model.num_channels = args.num_channels
        config.model.dtype = "bfloat16"
        config.ckpt_path = args.ckpt
        sde = F.get_standard_sde(config)
        model, params, _ = F.get_standard_score(config, sde, use_ema=True,
                                                load_model=True)
        rt = rt_dense
        obs, _, _ = results["dense"]
        best = (-1e9, None)
        for eta in (float(e) for e in str(args.eta).split(",")):
            for gamma in (float(g) for g in str(args.gamma).split(",")):
                for cg_iter in (int(c) for c in str(args.cg_iter).split(",")):
                    sampler = F.get_standard_sampler(
                        "dds", None, sde, rt, obs, num_steps=args.num_steps,
                        im_shape=(256, 256, 1), gamma=gamma, eta=eta,
                        cg_iter=cg_iter, travel_length=args.travel_length,
                        travel_repeat=args.travel_repeat,
                        score_apply=lambda p, x, t: model.apply({"params": p}, x, t),
                        score_params=params)
                    t0 = time.time()
                    x, _ = sampler.sample(jax.random.PRNGKey(7))
                    x = np.clip(np.asarray(x[0, :, :, 0]), 0, 1)
                    dt = time.time() - t0
                    p, s = PSNR(x, gt_model), SSIM(x, gt_model)
                    print(f"[dds eta={eta} gamma={gamma} cg={cg_iter}] "
                          f"{p:.2f} dB / {s:.4f} SSIM in {dt:.1f}s "
                          f"({args.num_steps} steps)  "
                          f"vs FDK {results['dense'][2]:.2f} dB", flush=True)
                    if p > best[0]:
                        best = (p, (eta, gamma, cg_iter))
                        np.savez(os.path.join(args.workdir, "dds_recon_best.npz"),
                                 recon=x, gt=gt_model, eta=eta, gamma=gamma,
                                 cg_iter=cg_iter, psnr=p, ssim=s)
        if best[1] is not None:
            print(f"[sweep best] {best[0]:.2f} dB at eta/gamma/cg = {best[1]}")


if __name__ == "__main__":
    main()
