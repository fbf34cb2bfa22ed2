#!/bin/bash
# Round-4 pause 1: perf variant grid + 512² e2e + walnut sweep + adapted×walnut.
# Run AFTER scripts/tpu_pause.sh (chip must be free).  ~1.5 h.
# Usage: bash scripts/pause1_r4.sh 2>&1 | tee /tmp/pause1_r4.log
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

# 0. probe-scale calibration: score the SHIPPED checkpoint (known 32.14 dB
# at the 1000-step protocol) on the trainer's exact 200-step probe
python scripts/probe_score.py --ckpt checkpoints/flagship_vesde_256_ema.msgpack.npz
python scripts/probe_score.py --ckpt outputs/flagship_r4/best_ema.msgpack.npz

# 1. scan-amortized UNet variant grid + true sampler overhead (~12 min)
python scripts/pause_perf_r4.py

# 1b. per-block forward profile (which blocks sit off the roofline)
python scripts/profile_unet_blocks.py

# 2. bench the combined perf candidates (~18 min: 3 compiles)
python bench.py --params_dtype bfloat16 --small_conv_matmul 1024
python bench.py --params_dtype bfloat16 --small_conv_matmul 0
# aggregate serving throughput: 8 chains per scan on one chip
python bench.py --params_dtype bfloat16 --small_conv_matmul 1024 --batch 8

# 3. 512² end-to-end DDS with flash attention live (~12 min)
python scripts/smoke_512.py --num_steps 100

# 4. walnut gamma/cg sweep at eta=0.15 with the DDPM prior (~40 min)
python scripts/walnut_full_scale.py --sde ddpm \
    --ckpt checkpoints/flagship_ddpm_256_ema.msgpack.npz \
    --eta 0.15 --gamma 0.005,0.01,0.04,0.1 --cg_iter 1,5 --num_steps 1000

# 5. adapted (LoRA-steered) sampling on the walnut measurement (~15 min)
python scripts/walnut_adapted.py \
    --ckpt checkpoints/flagship_ddpm_256_ema.msgpack.npz --sde ddpm \
    --eta 0.85 --num_steps 50 --num_optim_step 10

# 6. CPU smoke of the stint-3 combination (vpsde x learn_sigma x aapm data)
# before it gets chip time: 64^2, 2 epochs x 5 steps, probe + avg_tail on
AAPM_DATA_PATH=/root/repo/outputs/aapm_synth_64 \
    python run_score_based_models_train.py --sde vpsde --train_model_on aapm \
    --platform cpu --im_size 64 --num_channels 32 --batch_size 2 \
    --steps_per_epoch 5 --epochs 2 --save_every_n_epoch 1 --avg_tail 2 \
    --keep_best_probe dds --run_dir outputs/aapm_smoke

echo PAUSE1_DONE
