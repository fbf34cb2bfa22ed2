"""TPU-native diffusion framework for imaging inverse problems.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
`educating-dip/diffusion_models_dev_project` (steerable conditional diffusion
for CT reconstruction): score/epsilon diffusion training, conditional
posterior sampling (naive / DPS / DDS), and test-time LoRA adaptation —
compiled end-to-end with `jit`/`lax.scan` over `jax.sharding` meshes.

The package root re-exports the de-facto public API like the reference's
`src/__init__.py`.
"""

__version__ = "0.1.0"

from .data.aapm import AAPMDataset  # noqa: F401
from .data.ellipses import (EllipsesDataset,  # noqa: F401
                            DiskDistributedEllipsesDataset,
                            get_disk_dist_ellipses_dataset,
                            get_ellipses_dataset)
from .factory import (get_data_from_ground_truth,  # noqa: F401
                      get_standard_adapted_sampler, get_standard_configs,
                      get_standard_dataset, get_standard_dataset_configs,
                      get_standard_path, get_standard_ray_trafo,
                      get_standard_sampler, get_standard_score,
                      get_standard_sde, get_standard_train_dataset)
from .models.unet import UNetModel, UNetConfig  # noqa: F401
from .ops.sde import DDPM, SDE, VESDE, VPSDE  # noqa: F401
from .physics.ray_trafo import (RayTransform,  # noqa: F401
                                make_matmul_trafo, make_parallel_beam_trafo)
from .physics.simulation import simulate  # noqa: F401
from .sampling.adaptation import AdaptedSampler, tv_loss  # noqa: F401
from .sampling.engine import DiffusionSampler  # noqa: F401
from .training.ema import EmaState, ema_init, ema_update  # noqa: F401
from .training.losses import (epsilon_matching_loss,  # noqa: F401
                              score_matching_loss)
from .training.trainer import train_score_model  # noqa: F401
from .utils.metrics import PSNR, SSIM  # noqa: F401


def __getattr__(name):
    # heavy/optional submodule exports resolved lazily
    if name == "get_walnut_2d_ray_trafo":
        from .physics.walnut import get_walnut_2d_ray_trafo

        return get_walnut_2d_ray_trafo
    if name == "get_walnut_data":
        from .data.walnut import get_walnut_data

        return get_walnut_data
    raise AttributeError(name)
