"""Checkpoint conversion + native save/load.

Because romp_tpu parameter names equal the reference torch state_dict keys,
converting a released checkpoint (e.g. ROMP.pkl / BEV.pth) is a pure layout
transform: conv weights OIHW -> HWIO; everything else passes through.
`num_batches_tracked` counters are dropped.

Native format: a .npz of the flat dict (no torch needed to load).
"""
from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


def convert_torch_state_dict(state_dict: Mapping[str, "object"],
                             ) -> Dict[str, np.ndarray]:
    """Convert a torch state_dict (tensors or numpy arrays) to romp_tpu params.

    Conv kernels are detected by ndim == 4 and transposed OIHW -> HWIO.
    3D conv kernels (BEV refiners) are transposed OIDHW -> DHWIO.
    1D conv kernels (BEV bird's-eye 1D convs) OIL -> LIO.
    """
    out: Dict[str, np.ndarray] = {}
    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        arr = val.detach().cpu().numpy() if hasattr(val, "detach") else np.asarray(val)
        if key.endswith(".weight") and arr.ndim == 4:
            # Conv OIHW -> HWIO; ConvTranspose IOHW -> HWOI (the same
            # permutation — conv_transpose2d stores kernels HWOI).
            arr = arr.transpose(2, 3, 1, 0)
        elif key.endswith(".weight") and arr.ndim == 5:
            arr = arr.transpose(2, 3, 4, 1, 0)  # OIDHW -> DHWIO
        elif key.endswith(".weight") and arr.ndim == 3:
            arr = arr.transpose(2, 1, 0)  # OIL -> LIO
        out[key] = np.ascontiguousarray(arr.astype(np.float32))
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pkl/.pth checkpoint via torch (lazy import)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    # Strip DataParallel prefixes as the reference loader does
    # (`romp/lib/utils/train_utils.py:15`).
    state = {k[len("module."):] if k.startswith("module.") else k: v
             for k, v in state.items()}
    return convert_torch_state_dict(state)


def save_params(path: str, params: Mapping[str, "object"]) -> None:
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params(path: str, dtype=jnp.float32):
    data = np.load(path)
    return {k: jnp.asarray(data[k], dtype) for k in data.files}


def check_params_match(converted: Mapping[str, np.ndarray],
                       initialized: Mapping[str, "object"]) -> None:
    """Assert a converted checkpoint exactly covers an initialized param tree
    (same key set, same shapes). Catches silent architecture drift."""
    missing = sorted(set(initialized) - set(converted))
    unexpected = sorted(set(converted) - set(initialized))
    if missing or unexpected:
        raise ValueError(
            f"checkpoint mismatch; missing={missing[:8]}({len(missing)}) "
            f"unexpected={unexpected[:8]}({len(unexpected)})")
    for k in initialized:
        si, sc = np.shape(initialized[k]), np.shape(converted[k])
        if tuple(si) != tuple(sc):
            raise ValueError(f"{k}: shape {sc} != expected {si}")
