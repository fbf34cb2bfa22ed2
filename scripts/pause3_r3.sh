#!/bin/bash
# Round-3 final pause: flagship protocol evals at the end-of-round
# checkpoint (+ checkpoint-averaged variant), walnut rerun with the
# retrained prior, and the final bench.  ONE TPU process at a time:
# run AFTER scripts/tpu_pause.sh.
set -x
cd /root/repo
CKPT=${1:-outputs/flagship_r3/ckpts}
AVG=${2:-outputs/pause3_r3_avg_ema.msgpack.npz}   # build with average_ckpts.py first
OUT=outputs/pause3_r3
mkdir -p "$OUT"

# 1. Reference-default protocol at the latest checkpoint (the headline)
timeout 2400 python scripts/eval_flagship_256.py --ckpt "$CKPT" \
    --eta 0.15 --num_steps 1000 --num_images 10 \
    2>&1 | tee "$OUT/eval_eta015.log"

# 2. eta=0.85 protocol, full val set
timeout 2400 python scripts/eval_flagship_256.py --ckpt "$CKPT" \
    --eta 0.85 --num_steps 1000 --num_images 10 \
    2>&1 | tee "$OUT/eval_eta085.log"

# 3. Checkpoint-averaged EMA at eta=0.15 (variance reduction on the top
#    sigma-decade; skipped if the averaged file is absent)
if [ -f "$AVG" ]; then
    timeout 2400 python scripts/eval_flagship_256.py --ckpt "$AVG" \
        --eta 0.15 --num_steps 1000 --num_images 10 \
        2>&1 | tee "$OUT/eval_eta015_avg.log"
fi

# 4. Walnut protocol-scale DDS rerun with the retrained prior (cached
#    dense operator; eta 0.15 is the one that collapsed with the 81k prior)
timeout 3600 python scripts/walnut_full_scale.py --ckpt "$CKPT" \
    --num_steps 1000 --eta 0.15,0.85 \
    2>&1 | tee "$OUT/walnut_dds.log"

# 5. Final driver-style bench (cg_precision=high default)
timeout 900 python bench.py 2>&1 | tee "$OUT/bench.log"

echo PAUSE3_DONE
