#!/bin/bash
# Round-5 pause 1: perf profile + fused-gram bench + eval/bench default
# PSNR-parity check + probe-scale calibration.  ~35-40 min.
# Run AFTER scripts/tpu_pause.sh (chip must be free); resume with
# scripts/tpu_resume.sh afterwards.
# Usage: bash scripts/pause1_r5.sh 2>&1 | tee /tmp/pause1_r5.log
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

# 0. probe-scale calibration (VERDICT r4 weak #6): score the SHIPPED
# checkpoint (known 32.14 dB @ eta=0.15 / 38.80 @ 0.85 at the 1000-step
# protocol) and the run's current best on the trainer's exact probe
python scripts/probe_score.py --ckpt checkpoints/flagship_vesde_256_ema.msgpack.npz
python scripts/probe_score.py --ckpt outputs/flagship_r5/best_ema.msgpack.npz

# 1. per-block UNet forward profile (VERDICT r4 item 2: "profile first")
python scripts/profile_unet_blocks.py

# 2. bench with the fused Gram apply live (engine auto-upgrade)
python bench.py

# 3. PSNR-parity check for the r5 default flip (VERDICT item 8):
#    bf16 params + im2col (new defaults) vs fp32 + XLA conv, 3 images,
#    both protocol corners (VESDE eta=0.85, DDPM eta=0.15)
python scripts/eval_flagship_256.py --ckpt checkpoints/flagship_vesde_256_ema.msgpack.npz \
    --num_images 3 --eta 0.85
python scripts/eval_flagship_256.py --ckpt checkpoints/flagship_vesde_256_ema.msgpack.npz \
    --num_images 3 --eta 0.85 --params_dtype float32 --small_conv_matmul 0
python scripts/eval_flagship_256.py --ckpt checkpoints/flagship_ddpm_256_ema.msgpack.npz \
    --sde ddpm --num_images 3 --eta 0.15
python scripts/eval_flagship_256.py --ckpt checkpoints/flagship_ddpm_256_ema.msgpack.npz \
    --sde ddpm --num_images 3 --eta 0.15 --params_dtype float32 --small_conv_matmul 0

echo PAUSE1_DONE
