"""ctypes bindings for the native runtime components (native/).

* :func:`load_safetensors_native` — mmap zero-copy safetensors reader
  (native/safetensors_reader.cpp): returns numpy views backed by the mapped
  file; one page-cache copy serves Python, conversion, and device upload.
* :func:`load_images_native` — threaded JPEG/PNG decode + bilinear resize +
  [-1,1] NCHW normalize (native/image_loader.cpp), used by the visual-slider
  image bank.

Both build lazily with ``make`` on first use and fall back to the pure
Python paths (safetensors package / PIL) when the toolchain or libs are
unavailable — callers never hard-depend on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")

import ml_dtypes  # ships with jax; gives numpy a true bfloat16 dtype

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    # a bare uint16 view here would VALUE-cast downstream (1.0 → 16256.0);
    # ml_dtypes reinterprets the same bits as real bf16
    "BF16": ml_dtypes.bfloat16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}

_libs: Dict[str, Optional[ctypes.CDLL]] = {}


def _load_lib(name: str) -> Optional[ctypes.CDLL]:
    if name in _libs:
        return _libs[name]
    path = os.path.join(_NATIVE_DIR, name)
    if not os.path.exists(path):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, name], check=True, capture_output=True, timeout=120
            )
        except Exception:
            _libs[name] = None
            return None
    try:
        _libs[name] = ctypes.CDLL(path)
    except OSError:
        _libs[name] = None
    return _libs[name]


class NativeSafetensors:
    """Context manager over an mmapped safetensors file; tensors() returns
    zero-copy numpy views (valid until close)."""

    def __init__(self, path: str):
        lib = _load_lib("libstw.so")
        if lib is None:
            raise RuntimeError("native safetensors reader unavailable (build failed)")
        lib.stw_open.restype = ctypes.c_void_p
        lib.stw_open.argtypes = [ctypes.c_char_p]
        lib.stw_error.restype = ctypes.c_char_p
        lib.stw_tensor_count.restype = ctypes.c_int64
        lib.stw_tensor_count.argtypes = [ctypes.c_void_p]
        lib.stw_tensor_name.restype = ctypes.c_char_p
        lib.stw_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stw_tensor_dtype.restype = ctypes.c_char_p
        lib.stw_tensor_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stw_tensor_rank.restype = ctypes.c_int64
        lib.stw_tensor_rank.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stw_tensor_shape.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.stw_tensor_data.restype = ctypes.c_void_p
        lib.stw_tensor_data.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stw_tensor_nbytes.restype = ctypes.c_int64
        lib.stw_tensor_nbytes.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stw_close.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._h = lib.stw_open(path.encode())
        if not self._h:
            raise RuntimeError(f"stw_open: {lib.stw_error().decode()}")

    def tensors(self) -> Dict[str, np.ndarray]:
        lib, h = self._lib, self._h
        out = {}
        for i in range(lib.stw_tensor_count(h)):
            name = lib.stw_tensor_name(h, i).decode()
            dt = lib.stw_tensor_dtype(h, i).decode()
            rank = lib.stw_tensor_rank(h, i)
            shape = (ctypes.c_int64 * max(rank, 1))()
            lib.stw_tensor_shape(h, i, shape)
            shp = tuple(shape[k] for k in range(rank))
            nbytes = lib.stw_tensor_nbytes(h, i)
            ptr = lib.stw_tensor_data(h, i)
            buf = (ctypes.c_char * nbytes).from_address(ptr)
            np_dt = _DTYPES.get(dt)
            if np_dt is None:
                raise RuntimeError(f"unsupported safetensors dtype {dt}")
            arr = np.frombuffer(buf, dtype=np_dt).reshape(shp)
            out[name] = arr
        return out

    def close(self):
        if self._h:
            self._lib.stw_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


_SAFETENSORS_DTYPES = {**_DTYPES, "F8_E4M3": None, "F8_E5M2": None}


def load_safetensors_arena(path: str) -> Dict[str, np.ndarray]:
    """Bulk-read loader: ONE ``readinto`` of the whole file into a
    preallocated arena, tensors returned as zero-copy views into it.

    Why not mmap: on this host class (Firecracker VM, 1 core) userspace
    page-fault streams run at ~200-400 MB/s — every pass over a fresh
    mapping or a fresh multi-GB allocation crawls — while kernel
    ``readinto`` moves ~5 GB/s and warm-memory memcpy ~8 GB/s (measured,
    BASELINE.md r4 load profile). One kernel copy up front makes every
    downstream read (conversion views, device transfer) warm-memory fast.
    The arena stays alive through the views' ``.base`` references."""
    import json
    import struct

    with open(path, "rb", buffering=0) as f:
        head = f.read(8)
        (header_len,) = struct.unpack("<Q", head)
        header = json.loads(f.read(header_len))
        data_start = 8 + header_len
        size = os.fstat(f.fileno()).st_size - data_start
        arena = bytearray(size)
        view = memoryview(arena)
        done = 0
        while done < size:
            # Linux read() returns at most ~2 GiB per call — loop
            got = f.readinto(view[done : done + (1 << 30)])
            if not got:
                raise RuntimeError(f"short read on {path}: {done} != {size}")
            done += got
    out: Dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        np_dt = _SAFETENSORS_DTYPES.get(meta["dtype"])
        if np_dt is None:
            raise RuntimeError(f"unsupported safetensors dtype {meta['dtype']}")
        start, end = meta["data_offsets"]
        count = (end - start) // np.dtype(np_dt).itemsize
        out[name] = np.frombuffer(arena, dtype=np_dt, count=count, offset=start).reshape(
            meta["shape"]
        )
    return out


def load_safetensors_native(path: str, copy: bool = True) -> Dict[str, np.ndarray]:
    """Load all tensors; falls back to the safetensors package. Default
    (``copy=True``) goes through :func:`load_safetensors_arena` (one bulk
    kernel read, views safe after return). ``copy=False`` returns mmap
    views from the native reader (kept alive by a reference on the
    returned dict) — zero RAM footprint, but every access pays demand
    paging."""
    if copy:
        try:
            return load_safetensors_arena(path)
        except (RuntimeError, OSError, ValueError):
            from safetensors.numpy import load_file

            return dict(load_file(path))
    try:
        reader = NativeSafetensors(path)
    except RuntimeError:
        from safetensors.numpy import load_file

        return dict(load_file(path))
    tensors = reader.tensors()
    tensors["__reader__"] = reader  # keep the mapping alive
    return tensors


def load_images_native(paths: Sequence[str], resolution: int) -> Optional[np.ndarray]:
    """Threaded decode of a batch → float32 [n, 3, res, res] in [-1, 1];
    None when the native library is unavailable."""
    lib = _load_lib("libimload.so")
    if lib is None:
        return None
    lib.il_load_batch.restype = ctypes.c_int
    lib.il_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.il_error.restype = ctypes.c_char_p
    n = len(paths)
    out = np.empty((n, 3, resolution, resolution), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.il_load_batch(arr, n, resolution, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise RuntimeError(f"il_load_batch: {lib.il_error().decode()}")
    return out
