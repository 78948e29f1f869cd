"""Load reference (PyTorch) modules from /root/reference as numerical oracles.

The reference implementation is used ONLY to generate expected values in
tests — none of its code ships in romp_tpu. Modules are loaded by file path
so we don't need the reference package installed.
"""
import importlib.util
import sys

REF = "/root/reference"


def load_module(name: str, path: str):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_smpl():
    """Reference SMPL module (`simple_romp/romp/smpl.py`) — standalone."""
    return load_module("ref_smpl", f"{REF}/simple_romp/romp/smpl.py")


def ref_model():
    """Reference ROMP network (`simple_romp/romp/model.py`) — standalone."""
    return load_module("ref_model", f"{REF}/simple_romp/romp/model.py")


def ref_utils():
    """Reference utils (`simple_romp/romp/utils.py`) — needs cv2."""
    return load_module("ref_utils", f"{REF}/simple_romp/romp/utils.py")


def ref_bev_model():
    """Reference BEV network (`simple_romp/bev/model.py`).

    bev/model.py absolutely imports `romp.model` and relatively imports
    `.post_parser`; register path-only packages (no __init__ side effects,
    which would pull norfair/lap) before loading.
    """
    import importlib
    import types

    if "romp" not in sys.modules:
        pkg = types.ModuleType("romp")
        pkg.__path__ = [f"{REF}/simple_romp/romp"]
        sys.modules["romp"] = pkg
    return ref_package("refbevpkg", "simple_romp/bev")("model")


def ref_package(alias: str, subdir: str):
    """Expose a reference directory as an importable package WITHOUT running
    its __init__.py (which pulls optional deps like norfair/lap).

    e.g. ref_package("refromp", "simple_romp/romp") then
    importlib.import_module("refromp.post_parser").
    """
    import importlib
    import types

    if alias not in sys.modules:
        pkg = types.ModuleType(alias)
        pkg.__path__ = [f"{REF}/{subdir}"]
        sys.modules[alias] = pkg
    return lambda name: importlib.import_module(f"{alias}.{name}")


def ref_romp_post_parser():
    return ref_package("refromp", "simple_romp/romp")("post_parser")


def ref_bev_post_parser():
    import types

    if "romp" not in sys.modules:
        pkg = types.ModuleType("romp")
        pkg.__path__ = [f"{REF}/simple_romp/romp"]
        sys.modules["romp"] = pkg
    return ref_package("refbev", "simple_romp/bev")("post_parser")
