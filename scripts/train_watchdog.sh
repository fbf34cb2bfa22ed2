#!/bin/bash
# Restarts a training run if its JSONL log goes stale (the TPU relay
# occasionally wedges mid-step and never recovers; exact orbax resume makes
# a restart cheap).  Usage:
#
#   scripts/train_watchdog.sh <run_dir> <cmd_file> [stale_seconds]
#
# <cmd_file> holds the FULL training command to (re)launch (one line, will
# be run with bash -c).  Touch /tmp/train_pause to suspend the watchdog
# during intentional eval pauses.  Kills ONLY the pid in /tmp/train.pid.
RUN_DIR=${1:?run_dir}
CMD_FILE=${2:?cmd_file}
STALE=${3:-600}
LOG="$RUN_DIR/train_log.jsonl"
CMD_LOG="$RUN_DIR/../$(basename "$RUN_DIR")_train.log"

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
        # give the relay time to drop the dead session (a fresh client that
        # connects too early wedges in backend init — observed round 3)
        sleep 90
        rm -rf "$RUN_DIR"/ckpts/*.orbax-checkpoint-tmp
        # `exec` so /tmp/train.pid is the python process itself, not a
        # bash wrapper (killing only a wrapper orphans the trainer and a
        # relaunch would deadlock the one-process TPU relay).  NOTE: `cd`
        # must NOT be chained with && before the backgrounded command —
        # `a && b &` backgrounds the whole list and $! would be a subshell
        # wrapper pid, not the python pid (observed live in round 3).
        cd /root/repo
        PYTHONPATH=/root/repo:$PYTHONPATH nohup bash -c "exec $(cat "$CMD_FILE")" \
            >> "$CMD_LOG" 2>&1 &
        echo $! > /tmp/train.pid
        # reset the staleness clock: the relaunched trainer needs ~7 min of
        # restore+compile before its first log write, and the next loop
        # iterations would otherwise still see the pre-wedge mtime and kill
        # it mid-compile (same fix as tpu_resume.sh)
        touch "$LOG"
        echo "$(date -u +%T) watchdog: relaunched as $(cat /tmp/train.pid)" >> /tmp/watchdog.log
        sleep 420       # grace for restore+compile
    fi
done
