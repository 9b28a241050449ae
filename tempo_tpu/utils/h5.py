"""HDF5 maintenance helpers (reference: src/mltools/h5/h5_tools.py:1-39).

`repack` rewrites a file to reclaim space freed by deleted datasets (HDF5
never shrinks in place); `tree` renders the group/dataset hierarchy with
shapes and attrs. Host-side utilities — no device involvement."""

from __future__ import annotations

import os
from typing import List

import h5py


def repack(h5_file_path: str) -> None:
    """Copy every top-level object + root attrs into a fresh file, then
    atomically replace the original (h5_tools.py:4-21)."""
    tmp = h5_file_path + "_temp"
    with h5py.File(h5_file_path, "r") as src, h5py.File(tmp, "w") as dst:
        for key in src:
            src.copy(key, dst)
        for key, val in src.attrs.items():
            dst.attrs[key] = val
    os.replace(tmp, h5_file_path)


def _render(obj, prefix: str, lines: List[str]) -> None:
    if obj.attrs:
        attrs = "; ".join(f"{k}: {v}" for k, v in obj.attrs.items())
        lines.append(f"{prefix}attrs: {attrs}")
    for key in obj:
        item = obj[key]
        if isinstance(item, h5py.Dataset):
            lines.append(f"{prefix}{key}: shape={item.shape} "
                         f"dtype={item.dtype}")
        else:
            lines.append(f"{prefix}{key}/")
            _render(item, prefix + "  ", lines)


def tree(h5_file_path: str) -> str:
    """Recursive listing of groups/datasets/attrs (h5_tools.py:23-39);
    returns the rendering instead of printing."""
    lines: List[str] = []
    with h5py.File(h5_file_path, "r") as f:
        _render(f, "", lines)
    return "\n".join(lines)
