"""Helper to load modules of the upstream reference implementation directly
from file paths (bypassing its package __init__, which pulls CUDA-only deps).

Used only in tests as a golden oracle for numerical parity. Returns None if
the reference tree or torch is unavailable, so tests can skip gracefully.
"""
import importlib.util
import os
import sys

REF_ROOT = "/root/reference"


def load_ref_module(relpath: str, name: str, package_stubs=()):
    path = os.path.join(REF_ROOT, relpath)
    if not os.path.exists(path):
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    for stub in package_stubs:
        if stub not in sys.modules:
            import types

            sys.modules[stub] = types.ModuleType(stub)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception:
        return None
    return mod


def load_ref_sde():
    return load_ref_module("src/utils/sde.py", "ref_sde")


def load_ref_unet():
    """Load the reference ADM UNet as a synthetic package so its relative
    imports (`from .nn import ...`) resolve without executing the package
    __init__ (which pulls CUDA-only deps)."""
    import types

    pkg_dir = os.path.join(REF_ROOT, "src/third_party_models/dds_unet")
    if not os.path.isdir(pkg_dir):
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    if "ref_dds" not in sys.modules:
        pkg = types.ModuleType("ref_dds")
        pkg.__path__ = [pkg_dir]
        sys.modules["ref_dds"] = pkg
    try:
        import importlib

        return importlib.import_module("ref_dds.unet")
    except Exception:
        return None
