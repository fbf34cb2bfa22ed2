#!/bin/bash
# Round-5 continuation, part 2: walnut closure + 512^2 artifact.
# (Part 1, final_r5c.sh, settled the pallas whole-step question: the 9-shift
# kernel LOSES whole-step — 52.2 vs 64.4 steps/s — so its probe-parity step
# was dropped and the default stays pallas off.)
# Usage: bash scripts/final_r5d.sh 2>&1 | tee /tmp/final_r5d.log
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

DDPM=checkpoints/flagship_ddpm_256_ema.msgpack.npz

# 1. matched-budget 50-step plain DDS control (VERDICT r4 item 3)
echo "=== STEP3 walnut plain 50-step control ==="
timeout 900 python scripts/walnut_full_scale.py --ckpt $DDPM --sde ddpm \
    --num_steps 50 --eta 0.85 --gamma 0.01 --cg_iter 5

# 2. adapted 50x10 at lr 2e-4 (r4 default 1e-3 gave 13.5 dB)
echo "=== STEP4 walnut adapted lr 2e-4 ==="
sleep 30
timeout 1300 python scripts/walnut_adapted.py --ckpt $DDPM --sde ddpm \
    --eta 0.85 --num_steps 50 --num_optim_step 10 --lr 2e-4

# 3. walnut gamma probe at eta=0.15 (gamma 0.01 known = 14.51 dB r3)
echo "=== STEP5 walnut gamma probe ==="
sleep 30
timeout 1500 python scripts/walnut_full_scale.py --ckpt $DDPM --sde ddpm \
    --num_steps 1000 --eta 0.15 --gamma 0.04,0.1 --cg_iter 5

# 4. 512^2 end-to-end recon with flash attention live
echo "=== STEP6 512^2 artifact ==="
sleep 30
timeout 1200 python scripts/smoke_512.py --num_steps 100

echo FINAL_R5D_DONE
