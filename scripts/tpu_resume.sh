#!/bin/bash
# Resume the production training run after an eval pause: relaunch the
# command in /tmp/train_cmd.txt (exec'd so /tmp/train.pid is the python
# process) and re-enable the watchdog.
set -e
CMD_FILE=${1:-/tmp/train_cmd.txt}
CMD=$(cat "$CMD_FILE")
RUN_DIR=$(echo "$CMD" | sed -n 's/.*--run_dir \([^ ]*\).*/\1/p')
CMD_LOG="/root/repo/outputs/$(basename "${RUN_DIR:-run}")_train.log"
rm -rf /root/repo/"$RUN_DIR"/ckpts/*.orbax-checkpoint-tmp 2>/dev/null || true
# reset the staleness clock: the relaunched trainer needs ~7 min of
# restore+compile before its first log write, and the watchdog would
# otherwise see the pre-pause mtime and kill it mid-compile (observed
# round 3 at 22:05 — the fresh trainer lived 2 minutes)
touch /root/repo/"$RUN_DIR"/train_log.jsonl 2>/dev/null || true
# `cd` must NOT be &&-chained before the backgrounded command: `a && b &`
# backgrounds the whole list, making $! a subshell wrapper pid instead of
# the exec'd python pid (pause would then orphan the trainer and deadlock
# the one-process TPU relay — observed live in round 3).
cd /root/repo
PYTHONPATH=/root/repo:$PYTHONPATH nohup bash -c "exec $CMD" \
    >> "$CMD_LOG" 2>&1 &
echo $! > /tmp/train.pid
rm -f /tmp/train_pause
echo "trainer relaunched as $(cat /tmp/train.pid), watchdog re-enabled"
