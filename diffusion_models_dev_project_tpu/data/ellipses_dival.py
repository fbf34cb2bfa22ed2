"""Optional dival-backed ellipse dataset (API parity with the reference's
`EllipseDatasetFromDival`, `/root/reference/src/dataset/ellipses_dival.py` —
marked TO-BE-REMOVED there and unused by any reference entry point).

Gated on the external `dival` package; the in-repo parameterized rasterizer
(`data/ellipses.py`) is the supported path.
"""
from __future__ import annotations

import numpy as np

__all__ = ["EllipseDatasetFromDival"]


class EllipseDatasetFromDival:
    def __init__(self, impl: str = "astra_cpu"):
        try:
            from dival import get_standard_dataset
        except ImportError as e:  # pragma: no cover - optional dependency
            raise ImportError(
                "EllipseDatasetFromDival requires the optional `dival` "
                "package; use data.ellipses.get_ellipses_dataset (the "
                "in-repo parameterized generator) instead.") from e
        self.impl = impl
        dataset = get_standard_dataset("ellipses", impl=impl)
        self._train = dataset.create_torch_dataset(
            part="train",
            reshape=((1,) + dataset.space[0].shape,
                     (1,) + dataset.space[1].shape))
        self._val = dataset.create_torch_dataset(
            part="validation",
            reshape=((1,) + dataset.space[0].shape,
                     (1,) + dataset.space[1].shape))

    def _batches(self, ds, batch_size: int):
        n = len(ds)
        for start in range(0, n - batch_size + 1, batch_size):
            xs = [np.asarray(ds[i][1], np.float32) for i in
                  range(start, start + batch_size)]
            yield np.stack(xs).transpose(0, 2, 3, 1)   # NCHW -> NHWC

    def get_trainloader(self, batch_size: int, **_):
        return self._batches(self._train, batch_size)

    def get_valloader(self, batch_size: int, **_):
        return self._batches(self._val, batch_size)
