"""Output artifacts: PNGs, reconstruction info blobs, report.yaml.

Counterpart of the reference's save logic (run_conditional_sampling.py:82-103)
with torch-free containers (npz instead of .pt)."""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

__all__ = ["save_image_png", "save_recon_info", "write_report"]


def save_image_png(path, image: np.ndarray) -> None:
    """Save a [0, 1]-ish float image as an 8-bit grayscale PNG
    (reference uses PIL the same way, run_conditional_sampling.py:85-86)."""
    from PIL import Image

    arr = np.asarray(image, dtype=np.float32)
    Image.fromarray((np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8),
                    mode="L").save(str(path))


def save_recon_info(path, recon: np.ndarray, ground_truth: np.ndarray) -> None:
    np.savez_compressed(str(path), recon=np.asarray(recon),
                        ground_truth=np.asarray(ground_truth))


def write_report(path, report: Dict) -> None:
    import yaml

    def clean(v):
        if isinstance(v, dict):
            return {k: clean(x) for k, x in v.items()}
        if isinstance(v, (np.floating, np.integer)):
            return v.item()
        if isinstance(v, (list, tuple)):
            return [clean(x) for x in v]
        return v

    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    with open(str(path), "w") as f:
        yaml.dump(clean(report), f)
