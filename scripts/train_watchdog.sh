#!/bin/bash
# Restarts the flagship training run if its JSONL log goes stale (the TPU
# relay occasionally wedges mid-step and never recovers; exact orbax resume
# makes a restart cheap).  Touch /tmp/train_pause to suspend the watchdog
# during intentional eval pauses.  Kills ONLY the pid in /tmp/train.pid.
LOG=/root/repo/outputs/flagship_r2/train_log.jsonl
STALE=720          # seconds without a log write = wedged
CMD_LOG=/root/repo/outputs/flagship_r2_train.log

while true; do
    sleep 120
    [ -f /tmp/train_pause ] && continue
    [ -f "$LOG" ] || continue
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG")
    if [ $((now - mt)) -gt $STALE ]; then
        pid=$(cat /tmp/train.pid 2>/dev/null)
        echo "$(date -u +%T) watchdog: log stale $((now - mt))s, restarting pid $pid" >> /tmp/watchdog.log
        [ -n "$pid" ] && kill "$pid" 2>/dev/null
        sleep 10
        [ -n "$pid" ] && kill -9 "$pid" 2>/dev/null
        sleep 5
        rm -rf /root/repo/outputs/flagship_r2/ckpts/*.orbax-checkpoint-tmp
        cd /root/repo && PYTHONPATH=/root/repo:$PYTHONPATH nohup python \
            run_score_based_models_train.py --sde vesde --batch_size 24 \
            --num_channels 128 --dtype bfloat16 --lr 2e-4 --grad_clip 1.0 \
            --epochs 200 --steps_per_epoch 1000 --run_dir outputs/flagship_r2 \
            --sample_freq 25 --val_num_steps 100 --save_every_n_epoch 1 \
            >> "$CMD_LOG" 2>&1 &
        echo $! > /tmp/train.pid
        echo "$(date -u +%T) watchdog: relaunched as $(cat /tmp/train.pid)" >> /tmp/watchdog.log
        sleep 300       # grace for compile+resume
    fi
done
