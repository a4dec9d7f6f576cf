"""Bindings for the native (C++) batch collator.

The reference's input pipeline gets its native speed from torch DataLoader
workers running pad_sequence in libtorch (reference: dataloader.py:328-400,
train.py:99-112). The TPU build's equivalent is a small CPython extension
(timewarp_tpu/native/collate_ext.cc) compiled on first use with g++: one
call pads every ragged array of a batch straight into the dense output
buffer, extracting data pointers via the buffer protocol in C (the ctypes
alternative spends ~1 ms/batch marshaling pointers in Python — 50x the
actual copy work).

``pad_stack`` / ``lengths_to_mask`` transparently fall back to numpy when
the toolchain is unavailable, so the extension is a pure accelerator,
never a hard dependency.
"""
import importlib.util
import os
import subprocess
import sysconfig
import threading
from typing import Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "collate_ext.cc")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native", "_collate_ext.so")
_lock = threading.Lock()
_ext = None
_tried = False


def _load():
    global _ext, _tried
    with _lock:
        if _ext is not None or _tried:
            return _ext
        _tried = True
        try:
            src_mtime = os.path.getmtime(_SRC)
            if (
                not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < src_mtime
            ):
                include = sysconfig.get_paths()["include"]
                np_include = np.get_include()
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                     f"-I{include}", f"-I{np_include}", _SRC, "-o", _LIB_PATH],
                    check=True, capture_output=True, timeout=120,
                )
            spec = importlib.util.spec_from_file_location("_collate_ext", _LIB_PATH)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _ext = mod
        except Exception:  # no toolchain / sandboxed build failure
            _ext = None
        return _ext


def native_available() -> bool:
    return _load() is not None


def pad_stack(arrays: Sequence[np.ndarray], v_pad: int) -> np.ndarray:
    """Stack ragged [n_i, ...] arrays into [B, v_pad, ...], zero-padded.

    dtype-agnostic (rows are copied as raw bytes). Falls back to a numpy
    loop when the native extension is unavailable.
    """
    first = arrays[0]
    out = np.zeros((len(arrays), v_pad) + first.shape[1:], dtype=first.dtype)
    ext = _load()
    # The C side copies raw bytes, so a stray off-dtype array (e.g. float64
    # rows into a float32 batch) would silently reinterpret; only take the
    # native path for homogeneous dtypes and let numpy's assignment handle
    # (and upcast-check) the rest.
    if ext is not None and all(a.dtype == first.dtype for a in arrays):
        try:
            ext.pad_stack_into(arrays, out)
            return out
        except (ValueError, BufferError, TypeError):
            pass  # non-contiguous input etc. — numpy handles it below
    for i, a in enumerate(arrays):
        out[i, : a.shape[0]] = a
    return out


def lengths_to_mask(lengths: np.ndarray, v_pad: int) -> np.ndarray:
    """[B] atom counts -> [B, v_pad] bool mask (True = padding)."""
    lengths = np.asarray(lengths, dtype=np.int32)
    return np.arange(v_pad)[None, :] >= lengths[:, None]
