#!/bin/bash
# Round-3 final battery: DDPM-family protocol evals at the end-of-round
# epsilon checkpoint + the 5-snapshot VESDE average at eta=0.15.
# ONE TPU process at a time: run AFTER scripts/tpu_pause.sh.
set -x
cd /root/repo
DDPM_CKPT=${1:-outputs/ddpm_r3/ckpts}
AVG5=${2:-outputs/pause3_r3_avg5_ema.msgpack.npz}
OUT=outputs/pause4_r3
mkdir -p "$OUT"

# 1. DDPM DDS, reference default eta=0.15, full val set (the headline)
timeout 2400 python scripts/eval_flagship_256.py --sde ddpm \
    --ckpt "$DDPM_CKPT" --eta 0.15 --num_steps 1000 --num_images 10 \
    2>&1 | tee "$OUT/ddpm_dds_eta015.log"

# 2. DDPM DDS eta=0.85, full val set
timeout 2400 python scripts/eval_flagship_256.py --sde ddpm \
    --ckpt "$DDPM_CKPT" --eta 0.85 --num_steps 1000 --num_images 10 \
    2>&1 | tee "$OUT/ddpm_dds_eta085.log"

# 3. DDS + time-travel (schedule_jump travel_length=10, repeat=2)
timeout 2400 python scripts/eval_flagship_256.py --sde ddpm \
    --ckpt "$DDPM_CKPT" --eta 0.85 --num_steps 1000 \
    --travel_length 10 --travel_repeat 2 --num_images 5 \
    2>&1 | tee "$OUT/ddpm_dds_travel.log"

# 4. DPS-ancestral at the 1000-step budget (reference Ancestral_Sampling)
timeout 2400 python scripts/eval_flagship_256.py --sde ddpm \
    --ckpt "$DDPM_CKPT" --method dps --penalty 10.0 \
    --num_steps 1000 --num_images 5 \
    2>&1 | tee "$OUT/ddpm_dps_ancestral.log"

# 5. VESDE 5-snapshot average at eta=0.15 (does a wider average beat 32.1?)
timeout 2400 python scripts/eval_flagship_256.py \
    --ckpt "$AVG5" --eta 0.15 --num_steps 1000 --num_images 10 \
    2>&1 | tee "$OUT/vesde_avg5_eta015.log"

echo PAUSE4_DONE
