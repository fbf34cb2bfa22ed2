"""Convert the reference's shipped deterministic ellipse val set
(`dataset/disk_ellipses_val_256.pt`, loaded by the reference at
exp_utils.py:336-345) into a torch-free .npz consumed by
`factory._presaved_ellipses_path`.

Usage: python scripts/convert_reference_valset.py [src.pt] [dst.npz]
"""
import os
import sys

import numpy as np
import torch

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/dataset/disk_ellipses_val_256.pt"
DST = (sys.argv[2] if len(sys.argv) > 2 else
       os.path.join(os.path.dirname(__file__), "..", "data_assets",
                    "disk_ellipses_val_256.npz"))


def main():
    t = torch.load(SRC, map_location="cpu", weights_only=False)
    if isinstance(t, (list, tuple)):
        t = torch.stack(list(t))
    arr = np.asarray(t.numpy(), dtype=np.float32)
    # normalize to (N, H, W, 1) NHWC
    if arr.ndim == 4 and arr.shape[1] == 1:        # (N, 1, H, W)
        arr = arr.transpose(0, 2, 3, 1)
    elif arr.ndim == 3:                            # (N, H, W)
        arr = arr[..., None]
    assert arr.ndim == 4 and arr.shape[-1] == 1, arr.shape
    os.makedirs(os.path.dirname(os.path.abspath(DST)), exist_ok=True)
    np.savez_compressed(DST, images=arr)
    print(f"wrote {arr.shape} ({arr.dtype}) -> {DST}")


if __name__ == "__main__":
    main()
