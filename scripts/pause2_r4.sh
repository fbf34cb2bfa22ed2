#!/bin/bash
# Round-4 pause 2: VESDE protocol calibration — score the keep-best and
# tail-average candidates at the FULL reference protocol (1000-step DDS,
# eta=0.15, 10 val images) to calibrate the 200-step probe scale and decide
# ship/continue.  Run AFTER scripts/tpu_pause.sh.  ~20 min.
# Usage: bash scripts/pause2_r4.sh 2>&1 | tee /tmp/pause2_r4.log
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

python scripts/eval_flagship_256.py --sde vesde \
    --ckpt outputs/flagship_r4/best_ema.msgpack.npz \
    --method dds --eta 0.15 --num_steps 1000 --num_images 10

python scripts/eval_flagship_256.py --sde vesde \
    --ckpt outputs/flagship_r4/avg_ema_tail.msgpack.npz \
    --method dds --eta 0.15 --num_steps 1000 --num_images 10

# eta=0.85 regression check on the better of the two (edit if avg wins)
python scripts/eval_flagship_256.py --sde vesde \
    --ckpt outputs/flagship_r4/best_ema.msgpack.npz \
    --method dds --eta 0.85 --num_steps 1000 --num_images 10

echo PAUSE2_DONE
