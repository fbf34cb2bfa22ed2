#!/bin/bash
# Round-5 continuation window (~50 min chip): the pause-3 backlog that the
# environment reset wiped, ordered by VERDICT-r4 priority so the clock can
# cut the tail.  ONE TPU process at a time — this script is the only chip
# user while it runs.
# Usage: bash scripts/final_r5c.sh 2>&1 | tee /tmp/final_r5c.log
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

DDPM=checkpoints/flagship_ddpm_256_ema.msgpack.npz
VESDE=checkpoints/flagship_vesde_256_ema.msgpack.npz

# 1. whole-step bench with the Pallas 9-shift conv at the winning shapes
#    (pause-2 micro-bench: +20% at the 256^2 level; this decides the default)
echo "=== STEP1 pallas whole-step bench ==="
timeout 700 python bench.py --pallas_conv_min 16384
echo "=== STEP1B control bench (pallas off) ==="
timeout 500 python bench.py

# 2. pallas PSNR parity: the calibrated 200-step probe (ship VESDE probes
#    30.40 dB with XLA convs — same number with the kernel = parity)
echo "=== STEP2 pallas probe parity ==="
timeout 600 python scripts/probe_score.py --ckpt $VESDE --pallas_conv_min 16384

# 3. matched-budget 50-step plain DDS control (the r4 adapted run's missing
#    control) + one adapted lr variant (VERDICT item 3)
echo "=== STEP3 walnut plain 50-step control ==="
sleep 30
timeout 900 python scripts/walnut_full_scale.py --ckpt $DDPM --sde ddpm \
    --num_steps 50 --eta 0.85 --gamma 0.01 --cg_iter 5
echo "=== STEP4 walnut adapted lr 2e-4 ==="
sleep 30
timeout 1300 python scripts/walnut_adapted.py --ckpt $DDPM --sde ddpm \
    --eta 0.85 --num_steps 50 --num_optim_step 10 --lr 2e-4

# 5. walnut gamma probe at eta=0.15 (DDPM prior; gamma 0.01 known = 14.51 dB r3)
echo "=== STEP5 walnut gamma probe ==="
sleep 30
timeout 1500 python scripts/walnut_full_scale.py --ckpt $DDPM --sde ddpm \
    --num_steps 1000 --eta 0.15 --gamma 0.04,0.1 --cg_iter 5

# 6. 512^2 end-to-end recon with flash attention live
echo "=== STEP6 512^2 artifact ==="
sleep 30
timeout 1200 python scripts/smoke_512.py --num_steps 100

echo FINAL_R5C_DONE
