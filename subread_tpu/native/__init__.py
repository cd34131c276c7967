"""Native host layer: C++ hot loops for the output path.

Compiled lazily with g++ on first use; everything has a pure-Python
fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import sys

import numpy as np

_HERE = pathlib.Path(__file__).parent
_LIB = None
_TRIED = False


def _build() -> pathlib.Path | None:
    src = _HERE / "samtext.cpp"
    out = _HERE / "libsamtext.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(out), str(src)],
            check=True, capture_output=True, timeout=120,
        )
        return out
    except Exception as e:  # no toolchain / failed build → fallback
        print(f"// native build skipped: {e}", file=sys.stderr)
        return None


def get_lib():
    """ctypes handle to the native library, or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.format_sam_records.restype = ctypes.c_long
    _LIB = lib
    return _LIB


def format_sam_records(
    names: list[str],
    codes: np.ndarray, quals: np.ndarray, lens: np.ndarray,
    flags: np.ndarray, cidx: np.ndarray, pos1: np.ndarray,
    mapqs: np.ndarray, indel: np.ndarray, split: np.ndarray,
    junc_gap: np.ndarray | None,
    clip_l: np.ndarray | None, clip_r: np.ndarray | None,
    mapped: np.ndarray, nm: np.ndarray,
    contig_names: list[str],
) -> bytes | None:
    """Format a batch of SAM records natively; None → caller falls back."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(names)
    name_blob = "".join(names).encode()
    name_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(s.encode()) for s in names], out=name_off[1:])
    contig_blob = "".join(contig_names).encode()
    contig_off = np.zeros(len(contig_names) + 1, dtype=np.int64)
    np.cumsum([len(s.encode()) for s in contig_names], out=contig_off[1:])

    Lmax = codes.shape[1]
    cap = int(n * (2 * Lmax + 256) + name_blob.__sizeof__() + 4096)
    out = ctypes.create_string_buffer(cap)

    c = lambda a, t: np.ascontiguousarray(a, dtype=t)
    a_codes = c(codes, np.uint8)
    a_quals = c(quals, np.uint8)
    arrs = dict(
        lens=c(lens, np.int32), flags=c(flags, np.int32),
        cidx=c(cidx, np.int32), pos1=c(pos1, np.int32),
        mapqs=c(mapqs, np.int32), indel=c(indel, np.int32),
        split=c(split, np.int32),
        junc=c(junc_gap if junc_gap is not None else np.zeros(n), np.int32),
        clip_l=c(clip_l if clip_l is not None else np.zeros(n), np.int32),
        clip_r=c(clip_r if clip_r is not None else np.zeros(n), np.int32),
        mapped=c(mapped, np.uint8), nm=c(nm, np.int32),
    )
    ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    written = lib.format_sam_records(
        ctypes.c_int32(n),
        ctypes.c_char_p(name_blob), ptr(name_off),
        ptr(a_codes), ptr(a_quals), ptr(arrs["lens"]), ctypes.c_int32(Lmax),
        ptr(arrs["flags"]), ptr(arrs["cidx"]), ptr(arrs["pos1"]),
        ptr(arrs["mapqs"]), ptr(arrs["indel"]), ptr(arrs["split"]),
        ptr(arrs["junc"]), ptr(arrs["clip_l"]), ptr(arrs["clip_r"]),
        ptr(arrs["mapped"]), ptr(arrs["nm"]),
        ctypes.c_char_p(contig_blob), ptr(contig_off),
        out, ctypes.c_int64(cap),
    )
    if written < 0:
        return None
    return out.raw[:written]
