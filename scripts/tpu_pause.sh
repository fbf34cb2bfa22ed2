#!/bin/bash
# Pause the production training run for an eval window on the one-process
# TPU relay.  Suspends the watchdog (touch /tmp/train_pause), kills ONLY
# the recorded trainer pid, and waits for the relay to drop the session
# (a client that reconnects too early wedges in backend init).
set -e
touch /tmp/train_pause
pid=$(cat /tmp/train.pid 2>/dev/null || true)
if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    echo "pausing trainer pid $pid"
    kill "$pid" 2>/dev/null || true
    sleep 10
    kill -9 "$pid" 2>/dev/null || true
else
    echo "no live trainer (pid '$pid')"
fi
sleep "${1:-90}"   # relay cooldown
echo "chip free for eval work"
