#!/bin/bash
# Round-5 FINAL window (trimmed pause3, ~60 min wall): walnut gamma probe +
# matched-budget adapted closure + AAPM learn_sigma eval cells + 512^2
# artifact + pallas whole-step bench.  Ordered by VERDICT priority so the
# clock can cut the tail.
# Usage: bash scripts/pause3b_r5.sh 2>&1 | tee /tmp/pause3b_r5.log
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

DDPM=checkpoints/flagship_ddpm_256_ema.msgpack.npz
AAPM_BEST=outputs/aapm_ls_r5/best_ema.msgpack.npz

# 1. walnut gamma probe at eta=0.15 (DDPM prior; 0.01 known = 14.51 dB r3)
timeout 1500 python scripts/walnut_full_scale.py --ckpt $DDPM --sde ddpm \
    --num_steps 1000 --eta 0.15 --gamma 0.04,0.1 --cg_iter 5

# 2. matched-budget 50-step plain DDS control (the r4 adapted run's missing
# control) + one adapted lr variant
sleep 60
timeout 900 python scripts/walnut_full_scale.py --ckpt $DDPM --sde ddpm \
    --num_steps 50 --eta 0.85 --gamma 0.01 --cg_iter 5
sleep 60
timeout 1500 python scripts/walnut_adapted.py --ckpt $DDPM --sde ddpm \
    --eta 0.85 --num_steps 50 --num_optim_step 10 --lr 2e-4

# 3. AAPM learn_sigma matrix cells (model learned on aapm): aapm->aapm and
# aapm->ellipses through the unmodified CLI
sleep 60
timeout 1200 env AAPM_DATA_PATH=outputs/aapm_synth_256 python run_conditional_sampling.py \
    --model_learned_on aapm --dataset aapm --sde vesde --method dds \
    --num_steps 1000 --eta 0.85 --num_images 3 --num_channels 128 \
    --load_path $AAPM_BEST
sleep 60
timeout 1200 env AAPM_DATA_PATH=outputs/aapm_synth_256 python run_conditional_sampling.py \
    --model_learned_on aapm --dataset ellipses --sde vesde --method dds \
    --num_steps 1000 --eta 0.85 --num_images 3 --num_channels 128 \
    --load_path $AAPM_BEST

# 4. 512^2 end-to-end recon with flash attention live
sleep 60
timeout 1200 python scripts/smoke_512.py --num_steps 100

# 5. whole-step bench with the Pallas conv at the winning shapes
sleep 60
timeout 1500 python bench.py --pallas_conv_min 16384

echo PAUSE3B_DONE
