"""ctypes bindings to the native host runtime (native/gfnative.cpp).

Compiled on first use with g++ (cached under native/build/). Every entry
point has a pure-numpy fallback; `available()` reports whether the native
path loaded. The native code replaces the reference's rayon-parallelized
index build (README.md:24-26 of the reference) on the host side.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

log = logging.getLogger("genefuse")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "gfnative.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libgfnative.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
        return True
    except Exception as e:  # pragma: no cover - toolchain issues
        log.warning("native build failed, using numpy fallbacks: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _compile():
        return None
    lib = ctypes.CDLL(_SO)
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    p = ctypes.POINTER
    lib.gf_rolling_entries.restype = i64
    lib.gf_rolling_entries.argtypes = [
        p(ctypes.c_uint8), i64, i32, i32, i64,
        p(ctypes.c_uint32), p(i32), p(i32),
    ]
    lib.gf_stable_sort_by_kmer.restype = None
    lib.gf_stable_sort_by_kmer.argtypes = [p(ctypes.c_uint32), i64, p(i64)]
    lib.gf_pack_table.restype = i64
    lib.gf_pack_table.argtypes = [
        p(ctypes.c_uint32), p(i32), p(i32), i64, p(i32), i64, i32, i32,
    ]
    u8 = ctypes.c_uint8
    lib.gf_pack_pe_batch.restype = None
    lib.gf_pack_pe_batch.argtypes = [
        p(u8), p(u8), p(u8), p(u8), p(i32), p(i32),
        i64, i64, i64, i64, p(u8), p(u8),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def rolling_entries(
    codes: np.ndarray, contig: int, start_offset: int, exclude_last: bool
):
    """-> (kmers u32, contigs i32, poss i32) arrays of valid entries, or
    None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(codes)
    cap = max(0, n - 16 + 1)
    out_k = np.empty(cap, np.uint32)
    out_c = np.empty(cap, np.int32)
    out_p = np.empty(cap, np.int32)
    codes = np.ascontiguousarray(codes, np.uint8)
    m = lib.gf_rolling_entries(
        _ptr(codes, ctypes.c_uint8),
        n,
        contig,
        start_offset,
        1 if exclude_last else 0,
        _ptr(out_k, ctypes.c_uint32),
        _ptr(out_c, ctypes.c_int32),
        _ptr(out_p, ctypes.c_int32),
    )
    return out_k[:m], out_c[:m], out_p[:m]


def stable_argsort_kmers(kmers: np.ndarray):
    lib = _load()
    if lib is None:
        return None
    kmers = np.ascontiguousarray(kmers, np.uint32)
    order = np.empty(len(kmers), np.int64)
    lib.gf_stable_sort_by_kmer(
        _ptr(kmers, ctypes.c_uint32), len(kmers), _ptr(order, ctypes.c_int64)
    )
    return order


def pack_table(
    keys: np.ndarray, contigs: np.ndarray, poss: np.ndarray, nb: int,
    shift: int, slots: int, empty_sentinel: int
):
    """-> (nb, slots, 3) int32 table or None (native unavailable / overflow)."""
    lib = _load()
    if lib is None:
        return None
    table = np.zeros((nb, slots, 3), np.int32)
    table[:, :, 1] = empty_sentinel
    keys = np.ascontiguousarray(keys, np.uint32)
    contigs = np.ascontiguousarray(contigs, np.int32)
    poss = np.ascontiguousarray(poss, np.int32)
    failed = lib.gf_pack_table(
        _ptr(keys, ctypes.c_uint32),
        _ptr(contigs, ctypes.c_int32),
        _ptr(poss, ctypes.c_int32),
        len(keys),
        _ptr(table, ctypes.c_int32),
        nb,
        shift,
        slots,
    )
    if failed:
        return None
    return table


def pack_pe_batch(b1, q1, b2, q2, l1, l2, L: int, out_rows: int):
    """Pack a PE batch into the upload layout (ops/pack.py formats) in one
    native pass. -> (buf (out_rows, W) uint8, exotic (B,) bool) or None."""
    lib = _load()
    if lib is None:
        return None
    B, Lin = b1.shape
    w2 = (L + 1) // 2
    w4 = (L + 3) // 4
    W = 2 * w2 + 2 * w4
    out = np.empty((out_rows, W), np.uint8)
    exotic = np.zeros(B, np.uint8)
    u8 = ctypes.c_uint8
    i32 = ctypes.c_int32
    args = [np.ascontiguousarray(x, np.uint8) for x in (b1, q1, b2, q2)]
    l1c = np.ascontiguousarray(l1, np.int32)
    l2c = np.ascontiguousarray(l2, np.int32)
    lib.gf_pack_pe_batch(
        _ptr(args[0], u8), _ptr(args[1], u8), _ptr(args[2], u8),
        _ptr(args[3], u8), _ptr(l1c, i32), _ptr(l2c, i32),
        B, Lin, L, out_rows, _ptr(out, u8), _ptr(exotic, u8),
    )
    return out, exotic.astype(bool)
