#!/bin/bash
# Round-3 eval pause #1: prior-health probe + protocol evals + perf pass,
# serialized into one chip session (ONE TPU process at a time through the
# relay).  Run AFTER scripts/tpu_pause.sh; resume with scripts/tpu_resume.sh.
set -x
cd /root/repo
CKPT=${1:-outputs/flagship_r3/ckpts}
OUT=outputs/pause1_r3
mkdir -p "$OUT"

# 1. Tweedie denoising RMSE across sigma (the eta=0.15 health check)
timeout 900 python scripts/probe_tweedie.py --ckpt "$CKPT" \
    2>&1 | tee "$OUT/probe_tweedie.log"

# 2. Reference-default protocol: eta=0.15, 1000 steps, 10 images
timeout 2400 python scripts/eval_flagship_256.py --ckpt "$CKPT" \
    --eta 0.15 --num_steps 1000 --num_images 10 \
    2>&1 | tee "$OUT/eval_eta015.log"

# 3. eta=0.85 sanity (3 images): did the sigma-stratified loss hurt?
timeout 1200 python scripts/eval_flagship_256.py --ckpt "$CKPT" \
    --eta 0.85 --num_steps 1000 --num_images 3 \
    2>&1 | tee "$OUT/eval_eta085.log"

# 4. DDS component profile at the bench configuration (374M)
timeout 1200 python scripts/profile_dds.py \
    2>&1 | tee "$OUT/profile_dds.log"

# 5. bench at all three CG precisions (high = bf16x3 is the current
#    default since round 3; highest = fp32 reference-parity numerics)
timeout 900 python bench.py --cg_precision highest 2>&1 | tee "$OUT/bench_highest.log"
timeout 900 python bench.py --cg_precision high 2>&1 | tee "$OUT/bench_cg_high.log"
timeout 900 python bench.py --cg_precision default 2>&1 | tee "$OUT/bench_cg_default.log"

# 6. cg_precision=high quality check (vs step 3's fp32-CG numbers)
timeout 1200 python scripts/eval_flagship_256.py --ckpt "$CKPT" \
    --eta 0.85 --num_steps 1000 --num_images 3 --cg_precision high \
    2>&1 | tee "$OUT/eval_eta085_cghigh.log"

echo PAUSE1_DONE
