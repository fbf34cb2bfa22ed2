#!/bin/bash
# Round-5 pause 3 (~50 min): walnut gamma x cg_iter sweep with the DDPM
# prior (VERDICT r4 item 4) + the adapted-walnut matched-budget control
# and adaptation-lr sweep (item 3) + 512^2 e2e artifact (item 7).
# Run AFTER scripts/tpu_pause.sh; resume training afterwards.
# Usage: bash scripts/pause3_r5.sh 2>&1 | tee /tmp/pause3_r5.log
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

DDPM=checkpoints/flagship_ddpm_256_ema.msgpack.npz

# 1. walnut gamma x cg sweep at the reference-default eta=0.15 (DDPM prior:
# the family that does not collapse there), one shared operator build
timeout 2400 python scripts/walnut_full_scale.py --ckpt $DDPM --sde ddpm \
    --num_steps 1000 --eta 0.15 --gamma 0.005,0.01,0.04,0.1 --cg_iter 5
# best-gamma eta=0.85 run for the SSIM bar
timeout 1200 python scripts/walnut_full_scale.py --ckpt $DDPM --sde ddpm \
    --num_steps 1000 --eta 0.85 --gamma 0.04,0.1 --cg_iter 5

# 2. matched-budget plain control for the adapted run: 50-step plain DDS
sleep 60
timeout 900 python scripts/walnut_full_scale.py --ckpt $DDPM --sde ddpm \
    --num_steps 50 --eta 0.85 --gamma 0.01 --cg_iter 5

# 3. adapted 50x10 at two adaptation lrs (r4 default 1e-3 gave 13.5 dB)
sleep 60
timeout 1500 python scripts/walnut_adapted.py --ckpt $DDPM --sde ddpm \
    --eta 0.85 --num_steps 50 --num_optim_step 10 --lr 2e-4
sleep 60
timeout 1500 python scripts/walnut_adapted.py --ckpt $DDPM --sde ddpm \
    --eta 0.85 --num_steps 50 --num_optim_step 10 --lr 1e-3 --tv_penalty 1e-4

# 4. 512^2 end-to-end recon artifact with flash attention live
sleep 60
timeout 1500 python scripts/smoke_512.py --num_steps 100

echo PAUSE3_DONE
