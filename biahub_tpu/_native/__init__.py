"""Lazily-built native (C++) host-side hot loops, loaded via ctypes.

Plays the role the reference delegates to compiled dependencies
(``largestinteriorrectangle``, scipy's Hungarian; reference:
biahub/register.py:287-345, biahub/core/graph_matching.py:518-572).
The shared library is compiled once from the bundled source into the user
cache directory; every consumer falls back to the pure-Python implementation
when no compiler is available, so the native layer is an accelerator, never a
requirement.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["get_lib", "lir_2d", "edge_consistency_costs"]

_SOURCE = Path(__file__).parent / "fastops.cpp"
_LIB = None
_TRIED = False


def _build_lib() -> ctypes.CDLL | None:
    source = _SOURCE.read_text()
    digest = hashlib.sha256(source.encode()).hexdigest()[:16]
    cache_dir = Path(
        os.environ.get(
            "BIAHUB_TPU_NATIVE_CACHE",
            Path.home() / ".cache" / "biahub_tpu" / "native",
        )
    )
    lib_path = cache_dir / f"fastops_{digest}.so"
    if not lib_path.exists():
        cache_dir.mkdir(parents=True, exist_ok=True)
        tmp_path = lib_path.with_suffix(f".tmp{os.getpid()}.so")
        cmd = [
            os.environ.get("CXX", "g++"),
            "-O3",
            "-shared",
            "-fPIC",
            "-std=c++17",
            str(_SOURCE),
            "-o",
            str(tmp_path),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
            return None
        os.replace(tmp_path, lib_path)

    lib = ctypes.CDLL(str(lib_path))
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.lir_2d.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.lir_2d.restype = None
    lib.edge_consistency_costs.argtypes = [
        f64p, i64p, ctypes.c_int64,
        f64p, i64p, ctypes.c_int64,
        ctypes.c_double, f64p,
    ]
    lib.edge_consistency_costs.restype = None
    return lib


def get_lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if os.environ.get("BIAHUB_TPU_NO_NATIVE") != "1":
            _LIB = _build_lib()
    return _LIB


def lir_2d(mask: np.ndarray) -> tuple[int, int, int, int] | None:
    """Native largest interior rectangle; None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    out = np.zeros(4, dtype=np.int64)
    lib.lir_2d(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mask.shape[0],
        mask.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return tuple(int(v) for v in out)


def edge_consistency_costs(
    mov_lists: list[np.ndarray],
    ref_lists: list[np.ndarray],
    default_cost: float,
) -> np.ndarray | None:
    """Native sorted-assignment cost matrix; None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    mov_flat = np.ascontiguousarray(
        np.concatenate(mov_lists) if mov_lists else np.zeros(0), dtype=np.float64
    )
    ref_flat = np.ascontiguousarray(
        np.concatenate(ref_lists) if ref_lists else np.zeros(0), dtype=np.float64
    )
    mov_off = np.zeros(len(mov_lists) + 1, dtype=np.int64)
    np.cumsum([len(a) for a in mov_lists], out=mov_off[1:])
    ref_off = np.zeros(len(ref_lists) + 1, dtype=np.int64)
    np.cumsum([len(a) for a in ref_lists], out=ref_off[1:])

    out = np.empty((len(mov_lists), len(ref_lists)), dtype=np.float64)
    f64p = ctypes.POINTER(ctypes.c_double)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.edge_consistency_costs(
        mov_flat.ctypes.data_as(f64p),
        mov_off.ctypes.data_as(i64p),
        len(mov_lists),
        ref_flat.ctypes.data_as(f64p),
        ref_off.ctypes.data_as(i64p),
        len(ref_lists),
        default_cost,
        out.ctypes.data_as(f64p),
    )
    return out
