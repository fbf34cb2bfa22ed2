"""Weighted average of msgpack checkpoint files (host CPU only).

Cross-run checkpoint mixing: the shipped VESDE prior is itself a 3-snapshot
average (BENCH.md r3); this lets an r5 fine-tune snapshot be blended with
it without touching orbax state.

Usage: PYTHONPATH=. python scripts/mix_ckpts.py --out mixed.msgpack.npz \
           ckpt_a.msgpack.npz ckpt_b.msgpack.npz [--weights 0.5,0.5]
"""
import argparse

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("ckpts", nargs="+")
parser.add_argument("--out", required=True)
parser.add_argument("--weights", default=None,
                    help="comma-separated blend weights (default uniform)")
parser.add_argument("--dtype", default="float16", choices=["float16", "float32"])


def main():
    args = parser.parse_args()
    import flax
    import jax

    trees = []
    for path in args.ckpts:
        with open(path, "rb") as f:
            trees.append(flax.serialization.msgpack_restore(f.read()))
    w = ([float(x) for x in args.weights.split(",")] if args.weights
         else [1.0 / len(trees)] * len(trees))
    assert len(w) == len(trees) and abs(sum(w) - 1.0) < 1e-6, w
    mixed = jax.tree_util.tree_map(
        lambda *xs: np.sum([wi * x.astype(np.float64)
                            for wi, x in zip(w, xs)], axis=0
                           ).astype(args.dtype), *trees)
    with open(args.out, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(mixed))
    n = sum(int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(mixed))
    print(f"wrote {args.out} ({len(trees)} ckpts, weights {w}, {n} params)")


if __name__ == "__main__":
    main()
