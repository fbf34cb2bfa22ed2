"""TPU-native diffusion framework for imaging inverse problems.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
`educating-dip/diffusion_models_dev_project` (steerable conditional diffusion
for CT reconstruction): score/epsilon diffusion training, conditional
posterior sampling (naive / DPS / DDS), and test-time LoRA adaptation —
compiled end-to-end with `jit`/`lax.scan` over `jax.sharding` meshes.
"""

__version__ = "0.1.0"
