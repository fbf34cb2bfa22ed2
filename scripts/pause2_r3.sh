#!/bin/bash
# Round-3 eval pause #2: DDPM epsilon-family protocol evals at 256²
# (VERDICT r2 item 2) with the freshly trained DDPM prior, then the
# adapted-sampling 256² protocol (item 4) with the shipped VESDE prior.
# ONE TPU process at a time: run AFTER scripts/tpu_pause.sh.
set -x
cd /root/repo
DDPM_CKPT=${1:-outputs/ddpm_r3/ckpts}
VESDE_CKPT=${2:-checkpoints/flagship_vesde_256_ema.msgpack.npz}
OUT=outputs/pause2_r3
mkdir -p "$OUT"

# 1. DDPM DDS at the reference 1000-step protocol (eta=0.85 + reference
#    default 0.15), 10 val images
timeout 2400 python scripts/eval_flagship_256.py --sde ddpm \
    --ckpt "$DDPM_CKPT" --eta 0.85 --num_steps 1000 --num_images 10 \
    2>&1 | tee "$OUT/ddpm_dds_eta085.log"
timeout 2400 python scripts/eval_flagship_256.py --sde ddpm \
    --ckpt "$DDPM_CKPT" --eta 0.15 --num_steps 1000 --num_images 10 \
    2>&1 | tee "$OUT/ddpm_dds_eta015.log"

# 2. DDS + time-travel (schedule_jump: travel_length 10, repeat 2 — the
#    reference's repaint-style flags, samplers/utils.py:416-434)
timeout 2400 python scripts/eval_flagship_256.py --sde ddpm \
    --ckpt "$DDPM_CKPT" --eta 0.85 --num_steps 1000 \
    --travel_length 10 --travel_repeat 2 --num_images 5 \
    2>&1 | tee "$OUT/ddpm_dds_travel.log"

# 3. DPS-ancestral at the 1000-step budget (reference Ancestral_Sampling)
timeout 2400 python scripts/eval_flagship_256.py --sde ddpm \
    --ckpt "$DDPM_CKPT" --method dps --penalty 10.0 \
    --num_steps 1000 --num_images 5 \
    2>&1 | tee "$OUT/ddpm_dps_ancestral.log"

# 4. Adapted (steerable) sampling at 256²: in-distribution + OOD with the
#    shipped VESDE prior, reference adapted defaults (50x10, r=4, eta=0.85)
timeout 3600 python scripts/eval_adapted_256.py --ckpt "$VESDE_CKPT" \
    --num_in_dist 3 --num_ood 3 \
    2>&1 | tee "$OUT/adapted_256.log"

echo PAUSE2_DONE
