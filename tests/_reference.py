"""Helper to load modules of the upstream reference implementation directly
from file paths (bypassing its package __init__, which pulls CUDA-only deps).

Used only in tests as a golden oracle for numerical parity. Returns None if
the reference tree or torch is unavailable, so tests can skip gracefully.
"""
import importlib.util
import os
import sys

REF_ROOT = "/root/reference"


_MODULE_CACHE = {}


def load_ref_module(relpath: str, name: str, package_stubs=()):
    """Load (and memoize) a reference module.  Memoization matters: the
    reference dispatches on `isinstance` against class registries, so every
    consumer must see the SAME class objects."""
    if (relpath, name) in _MODULE_CACHE:
        return _MODULE_CACHE[(relpath, name)]
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
    _MODULE_CACHE[(relpath, name)] = mod
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


def load_ref_samplers():
    """Load reference src/samplers/utils.py with its intra-repo imports
    satisfied by the real sde/cg modules and a stubbed UNetModel."""
    import types

    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    sde_mod = load_ref_sde()
    if sde_mod is None:
        return None
    src_pkg = types.ModuleType("src")
    src_pkg.__path__ = [os.path.join(REF_ROOT, "src")]
    utils_pkg = types.ModuleType("src.utils")
    for name in ("SDE", "VESDE", "VPSDE", "DDPM", "_EPSILON_PRED_CLASSES",
                 "_SCORE_PRED_CLASSES"):
        setattr(utils_pkg, name, getattr(sde_mod, name))
    physics_pkg = types.ModuleType("src.physics")
    physics_pkg.BaseRayTrafo = object
    tpm = types.ModuleType("src.third_party_models")
    tpm.UNetModel = object
    sys.modules.update({"src": src_pkg, "src.utils": utils_pkg,
                        "src.physics": physics_pkg,
                        "src.third_party_models": tpm})
    # cg.py uses a relative import (`from ..physics import BaseRayTrafo`),
    # so it must be loaded under its real package name
    cg_mod = load_ref_module("src/utils/cg.py", "src.utils.cg")
    if cg_mod is None:
        return None
    sys.modules["src.utils.cg"] = cg_mod
    return load_ref_module("src/samplers/utils.py", "ref_samplers")
