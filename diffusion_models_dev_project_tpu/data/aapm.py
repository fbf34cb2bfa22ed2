"""AAPM LDCT (L067) slice dataset.

Mirrors `/root/reference/src/dataset/aapm.py:12-40`: slices are `.npy`
files named by a float prefix; the test fold is every 8th slice and the
validation fold is every 40th of the remainder.  The reference additionally
supports DICOM via pydicom — here slices are expected as `.npy` arrays (the
format the reference actually loads, aapm.py:38-39).

Returns NHWC float32 images.
"""
from __future__ import annotations

import os
from typing import Iterator

import numpy as np

__all__ = ["AAPMDataset"]


class AAPMDataset:
    def __init__(self, part: str, base_path: str, seed: int = 1):
        assert part in ("val", "test")
        self.part = part
        self.base_path = base_path
        files = os.listdir(base_path)
        files.sort(key=lambda n: float(n.split(".")[0]))
        test = files[::8]
        if part == "test":
            self.slices = test
        else:
            rest = sorted(set(files) - set(test), key=lambda n: float(n.split(".")[0]))
            self.slices = rest[::40]

    def __len__(self) -> int:
        return len(self.slices)

    def __getitem__(self, idx: int) -> np.ndarray:
        x = np.load(os.path.join(self.base_path, self.slices[idx]))
        return np.asarray(x, dtype=np.float32)[..., None]   # (H, W, 1)

    def __iter__(self) -> Iterator[np.ndarray]:
        for i in range(len(self)):
            yield self[i]
