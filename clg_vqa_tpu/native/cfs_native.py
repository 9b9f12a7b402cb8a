"""ctypes binding + lazy build for the native CFS gather kernel."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cfs_gather.cpp")
_SO = os.path.join(_HERE, "libcfs_gather.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def build(force: bool = False) -> str | None:
    """Compile the shared library with g++ (cached by mtime)."""
    if (not force and os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import logging
        logging.getLogger(__name__).warning("native CFS build failed: %s", e)
        return None


def load():
    """Returns the loaded library or None (Python fallback path)."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        so = build()
        if so is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:
            # a stale/incompatible binary must degrade to the Python
            # fallback, not crash the data pipeline
            import logging
            logging.getLogger(__name__).warning(
                "native CFS library failed to load (%s); python fallback", e)
            _build_failed = True
            return None
        lib.cfsg_open.restype = ctypes.c_void_p
        lib.cfsg_open.argtypes = [ctypes.c_char_p]
        lib.cfsg_close.argtypes = [ctypes.c_void_p]
        lib.cfsg_gather.restype = ctypes.c_int
        lib.cfsg_gather.argtypes = [
            ctypes.c_void_p,                      # handle
            ctypes.POINTER(ctypes.c_int64),       # offsets
            ctypes.POINTER(ctypes.c_int64),       # indices
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


_handles: dict[str, int] = {}


def _handle_for(lib, reader) -> int:
    h = _handles.get(reader.path)
    if h is None:
        with _lock:     # prefetch threads race the first open; one mmap
            h = _handles.get(reader.path)
            if h is None:
                h = lib.cfsg_open(reader.path.encode())
                if not h:
                    raise OSError(f"cfsg_open failed: {reader.path}")
                _handles[reader.path] = h
    return h


def gather(lib, reader, indices: np.ndarray, *, max_regions: int,
           num_locs: int, norm_embeddings: bool,
           add_global_imgfeat: str | None, num_threads: int | None = None):
    """Parallel native batch assembly. Mirrors CfsReader._gather_py."""
    h = _handle_for(lib, reader)
    B = len(indices)
    Rp = max_regions + int(add_global_imgfeat is not None)
    # feat dim from first record
    fd = reader.get_by_index(int(indices[0])).features.shape[1]
    feats = np.zeros((B, Rp, fd), np.float32)
    locs = np.zeros((B, Rp, num_locs), np.float32)
    mask = np.zeros((B, Rp), np.int32)
    offsets = np.ascontiguousarray(reader.offsets, np.int64)
    idx = np.ascontiguousarray(indices, np.int64)
    ag = {None: 0, "first": 1, "last": 2}[add_global_imgfeat]
    nt = num_threads or min(16, os.cpu_count() or 4)
    ret = lib.cfsg_gather(
        ctypes.c_void_p(h),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        B, Rp, num_locs, fd, int(norm_embeddings), ag, nt,
        feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        locs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if ret == -2:
        raise ValueError(
            "cfsg_gather: record(s) with a feature dim different from "
            f"{fd} in the requested batch (mixed/corrupt store) — the "
            "python path raises a shape error on the same input")
    if ret != 0:
        raise RuntimeError(f"cfsg_gather returned {ret}")
    return feats, locs, mask
