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
        assert part in ("val", "test", "train")
        self.part = part
        self.base_path = base_path
        files = os.listdir(base_path)
        files.sort(key=lambda n: float(n.split(".")[0]))
        test = files[::8]
        rest = sorted(set(files) - set(test), key=lambda n: float(n.split(".")[0]))
        if part == "test":
            self.slices = test
        elif part == "val":
            self.slices = rest[::40]
        else:
            # extension: the reference ships only val/test (its AAPM score
            # model arrives as a pretrained checkpoint, aapm.py:21); to train
            # one here, 'train' = every non-test slice not in the val fold
            self.slices = [s for i, s in enumerate(rest) if i % 40]

    def __len__(self) -> int:
        return len(self.slices)

    def __getitem__(self, idx: int) -> np.ndarray:
        x = np.load(os.path.join(self.base_path, self.slices[idx]))
        return np.asarray(x, dtype=np.float32)[..., None]   # (H, W, 1)

    def __iter__(self) -> Iterator[np.ndarray]:
        for i in range(len(self)):
            yield self[i]

    def batches(self, batch_size: int, *, repeat: bool = True,
                augment: bool = True):
        """Endless iterator of shuffled on-device NHWC batches (training).

        Mirrors the ellipse dataset's `.batches` interface; slices are
        cached host-side (the AAPM folds are small) and lightly augmented
        with random flips — the natural symmetry group for axial CT."""
        import jax.numpy as jnp

        cache = np.stack([self[i] for i in range(len(self))])   # (N,H,W,1)
        rng = np.random.default_rng(1234)
        order = rng.permutation(len(cache))
        i = 0
        while True:
            if i + batch_size > len(cache):
                if not repeat:
                    return
                order = rng.permutation(len(cache))
                i = 0
            batch = cache[order[i:i + batch_size]]
            if augment:
                flips = rng.random(batch.shape[0]) < 0.5
                batch = np.where(flips[:, None, None, None],
                                 batch[:, :, ::-1], batch)
            yield jnp.asarray(batch)
            i += batch_size
