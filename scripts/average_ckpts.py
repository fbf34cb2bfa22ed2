"""Average the EMA shadows of several orbax training checkpoints.

Checkpoint averaging targets the measured η=0.15 failure mode (BENCH.md
round-2: the top σ-decade score fluctuates *between* EMA snapshots while
each individual snapshot is accurate at σ ≤ 20) — averaging K consecutive
snapshots is a zero-training-cost variance reduction on exactly that axis,
equivalent to extending the EMA horizon post-hoc.

Usage: PYTHONPATH=. python scripts/average_ckpts.py \
          --ckpt_dir outputs/flagship_r2/ckpts --steps 77000,78000,... \
          --out outputs/avg_ema.msgpack.npz [--dtype float16]

Runs entirely on host CPU (no TPU process is started).
"""
import argparse
import os
import sys

parser = argparse.ArgumentParser()
parser.add_argument("--ckpt_dir", required=True)
parser.add_argument("--steps", required=True,
                    help="comma-separated checkpoint steps to average")
parser.add_argument("--out", required=True)
parser.add_argument("--dtype", default="float16", choices=["float16", "float32"])
parser.add_argument("--what", default="ema", choices=["ema", "params"])


def main():
    args = parser.parse_args()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import flax

    from diffusion_models_dev_project_tpu.utils.checkpoint import Checkpointer

    steps = [int(s) for s in args.steps.split(",")]
    ckpt = Checkpointer(args.ckpt_dir)
    acc = None
    for step in steps:
        state = ckpt.restore(step=step)
        tree = (state["ema"]["shadow"] if args.what == "ema"
                else state["params"])
        tree = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), tree)
        acc = tree if acc is None else jax.tree_util.tree_map(
            np.add, acc, tree)
        print(f"loaded step {step}", flush=True)
    k = float(len(steps))
    out_dtype = np.dtype(args.dtype)
    avg = jax.tree_util.tree_map(lambda a: (a / k).astype(out_dtype), acc)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(avg))
    print(f"wrote {args.out} (avg of {len(steps)} ckpts, {args.dtype})")


if __name__ == "__main__":
    main()
