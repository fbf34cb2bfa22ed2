"""Shared walnut-protocol setup for the full-scale scripts.

The real CWI raw data is not downloadable here (zero egress), so the
measured `scan_geom_corrected.geom` orbit is replaced by a synthetic
circular cone-beam orbit with the CWI scanner's magnification (reference
`src/dataset/walnut_utils.py:239-303`); every downstream code path (mask
probing, single-pass assembly, `.mat` round-trip, ELL + dense operators,
FDK, DDS) is the production one.
"""
import numpy as np

# CWI walnut scanner: SOD 66 mm, SDD 199 mm, 0.1496 mm pixels
SOD, SDD, PIX = 66.0, 199.0, 0.1496
ASS, CSS = 20, 6                     # reference walnut_configs.py:21-22

# the shipped SINGLE_SLICE_CONFIGS encode the REAL scanner's detector row
# offset (slice_offset=3 against rows 474..482); the synthetic circular
# orbit is perfectly centered, so use the centered equivalent — central
# slice of a 9-slice slab against the 9 detector-center rows
SLICE_CFG = dict(num_slices=9, slice_offset=0, num_proj_rows=9,
                 first_proj_row=(972 - 9) // 2)


def walnut_phantom(n=501):
    """Walnut-like 2D phantom: shell, interior lobes, air gaps."""
    yy, xx = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n),
                         indexing="ij")
    r2 = xx ** 2 + (yy * 1.15) ** 2
    img = np.zeros((n, n), np.float32)
    img[r2 < 0.72 ** 2] = 0.55                           # shell
    img[r2 < 0.62 ** 2] = 0.25                           # interior
    th = np.arctan2(yy, xx)
    lobes = 0.28 * (np.cos(2 * th) ** 2) * (r2 < 0.55 ** 2)
    img += lobes.astype(np.float32)
    img[((xx - 0.15) ** 2 + yy ** 2) < 0.08 ** 2] = 0.02  # air pocket
    img[(xx ** 2 + (yy + 0.3) ** 2) < 0.05 ** 2] = 0.02
    return np.clip(img, 0, 1)


def build_walnut_trafo(workdir, impl="dense", new_shape=(256, 256)):
    """Protocol-scale walnut operator (501², 60 angles × 128 cols)."""
    from diffusion_models_dev_project_tpu.physics.cone_beam import (
        circular_cone_vecs)
    from diffusion_models_dev_project_tpu.physics.walnut import (
        get_walnut_2d_ray_trafo)

    vecs = circular_cone_vecs(1200, src_radius=SOD, det_radius=SDD - SOD,
                              det_spacing=(PIX, PIX))
    return get_walnut_2d_ray_trafo(
        workdir, walnut_id=1, orbit_id=2, angular_sub_sampling=ASS,
        proj_col_sub_sampling=CSS, new_shape=new_shape, vecs_all=vecs,
        impl=impl, single_slice_config=SLICE_CFG)
