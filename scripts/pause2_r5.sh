#!/bin/bash
# Round-5 pause 2 (~45 min): Pallas-conv micro-bench + bench variants +
# VESDE r5b training-progress eval + the DDPM fp32 parity control that
# wedged in pause 1.
# Run AFTER scripts/tpu_pause.sh (chip must be free); resume training with
# scripts/tpu_resume.sh afterwards.
# Usage: bash scripts/pause2_r5.sh 2>&1 | tee /tmp/pause2_r5.log
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

# 0. conv kernel shoot-out at the hot shapes (r5 per-block profile: the
# forward is conv-bound)
timeout 1200 python scripts/bench_conv3x3.py --reps 50

# 1. bench with the Pallas conv at the two biggest levels (65536/16384 HW)
timeout 900 python bench.py --pallas_conv_min 16384
# control at current defaults
timeout 900 python bench.py

# 2. probe all VESDE candidates in ONE compiled sampler: the r5b best, its
# tail average, and cross-run mixes with the shipped prior (scripts/mix_ckpts.py)
sleep 60
timeout 1800 python scripts/probe_score.py --ckpt checkpoints/flagship_vesde_256_ema.msgpack.npz,outputs/flagship_r5b/best_ema.msgpack.npz,outputs/flagship_r5b/avg_ema_tail.msgpack.npz,outputs/mix_ship_best.msgpack.npz,outputs/mix_ship75_best25.msgpack.npz

# 2b. 10-image eta=0.15 protocol on the probe winner (fill in from 2):
# timeout 1800 python scripts/eval_flagship_256.py --ckpt <winner> --num_images 10 --eta 0.15

# 3. the wedged DDPM fp32 parity control from pause 1
sleep 60   # relay cooldown between processes
timeout 900 python scripts/eval_flagship_256.py \
    --ckpt checkpoints/flagship_ddpm_256_ema.msgpack.npz \
    --sde ddpm --num_images 3 --eta 0.15 --params_dtype float32 --small_conv_matmul 0

echo PAUSE2_DONE
