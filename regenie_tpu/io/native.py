"""ctypes bindings for the native decode library (native/decoder.cpp).

Auto-builds libregenie_native.so on first use if a toolchain is
available; all callers fall back to the pure-numpy decoders when the
library is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libregenie_native.so")
    if not os.path.isfile(so):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], capture_output=True, timeout=120, check=True
            )
        except Exception:
            return None
    if not os.path.isfile(so):
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.bed_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.bgen12_decode.restype = ctypes.c_int64
    lib.bgen12_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    if hasattr(lib, "bgen12_extract_planes"):
        lib.bgen12_extract_planes.restype = ctypes.c_int64
        lib.bgen12_extract_planes.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
        ]
    if hasattr(lib, "format_sumstat_single"):
        lib.format_sumstat_single.restype = ctypes.c_int64
        lib.format_sumstat_single.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.sumstat_field_budget.restype = ctypes.c_int64
    if hasattr(lib, "format_prefixed_float_rows"):
        lib.format_prefixed_float_rows.restype = ctypes.c_int64
        lib.format_prefixed_float_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
    if hasattr(lib, "format_loco_rows"):
        lib.format_loco_rows.restype = ctypes.c_int64
        lib.format_loco_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
    if hasattr(lib, "gzip_compress_members"):
        lib.gzip_compress_members.restype = ctypes.c_int64
        lib.gzip_compress_members.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
        ]
    if hasattr(lib, "htp_field_budget"):
        lib.htp_field_budget.restype = ctypes.c_int64
    if hasattr(lib, "all_field_budget"):
        lib.all_field_budget.restype = ctypes.c_int64
        lib.all_field_budget.argtypes = [ctypes.c_int64]
    if hasattr(lib, "format_sumstat_all"):
        lib.format_sumstat_all.restype = ctypes.c_int64
        lib.format_sumstat_all.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
    if hasattr(lib, "format_sumstat_htp"):
        lib.format_sumstat_htp.restype = ctypes.c_int64
        lib.format_sumstat_htp.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
    lib.pgen_decode_block.restype = ctypes.c_int64
    lib.pgen_decode_block.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
    ]
    _LIB = lib
    return _LIB


def bed_decode_native(raw: np.ndarray, n_samples: int) -> Optional[np.ndarray]:
    """[B, nbytes] packed -> [B, N] int8, or None if lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw)
    B, nb = raw.shape
    out = np.empty((B, n_samples), dtype=np.int8)
    lib.bed_decode(
        raw.ctypes.data, ctypes.c_int64(B), ctypes.c_int64(nb),
        ctypes.c_int64(n_samples), out.ctypes.data,
    )
    return out


def bgen12_decode_native(
    comp: bytes,
    offsets: np.ndarray,
    csizes: np.ndarray,
    usizes: np.ndarray,
    n_samples: int,
    compression: int,
    ref_last: bool,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Batch-decompress+decode BGEN v1.2 genotype blocks.
    Returns (dosage [B, N], info_num [B, N]) or None."""
    lib = get_lib()
    if lib is None:
        return None
    n_var = len(offsets)
    dosage = np.empty((n_var, n_samples), dtype=np.float64)
    info_num = np.empty((n_var, n_samples), dtype=np.float64)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    csizes = np.ascontiguousarray(csizes, dtype=np.int64)
    usizes = np.ascontiguousarray(usizes, dtype=np.int64)
    nfail = lib.bgen12_decode(
        comp, offsets.ctypes.data, csizes.ctypes.data, usizes.ctypes.data,
        ctypes.c_int64(n_var), ctypes.c_int64(n_samples),
        ctypes.c_int(compression), ctypes.c_int(1 if ref_last else 0),
        dosage.ctypes.data, info_num.ctypes.data,
    )
    if nfail > 0:
        return None  # caller falls back to python path for exotic layouts
    return dosage, info_num


def bgen12_extract_planes_native(
    comp: bytes,
    offsets: np.ndarray,
    csizes: np.ndarray,
    usizes: np.ndarray,
    n_samples: int,
    compression: int,
) -> Optional[np.ndarray]:
    """Inflate-only BGEN v1.2-8bit plane extraction for the fused TPU
    scorer: returns [B, 2, N] uint8 (k0 plane, k1 plane; missing
    samples = 255/255 sentinel), or None when the lib is unavailable or
    any variant is outside the fast layout (non-8-bit, phased, clipped
    probabilities) — caller falls back to the parsing decoder."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "bgen12_extract_planes"):
        return None
    n_var = len(offsets)
    planes = np.empty((n_var, 2, n_samples), dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    csizes = np.ascontiguousarray(csizes, dtype=np.int64)
    usizes = np.ascontiguousarray(usizes, dtype=np.int64)
    nfail = lib.bgen12_extract_planes(
        comp, offsets.ctypes.data, csizes.ctypes.data, usizes.ctypes.data,
        ctypes.c_int64(n_var), ctypes.c_int64(n_samples),
        ctypes.c_int(compression), planes.ctypes.data,
    )
    if nfail > 0:
        return None
    return planes


def pgen_decode_block_native(
    data: bytes,
    fpos: np.ndarray,
    vrtypes: np.ndarray,
    offsets: np.ndarray,
    n_samples: int,
) -> Optional[np.ndarray]:
    """Batch-decode PGEN variants (hardcalls + 16-bit dosage tracks) via
    the native pgenlib-replacement kernel. offsets: requested variant
    indices; LD-compressed records resolve to their nearest non-LD base,
    decoded once and shared. Returns [B, N] float64 ALT dosages
    (missing = -3) or None (lib unavailable / unsupported record
    encountered -> caller falls back to the python decoder)."""
    lib = get_lib()
    if lib is None:
        return None
    offsets = np.asarray(offsets, dtype=np.int64)
    vr = vrtypes
    # resolve LD bases: nearest preceding non-LD variant, shared per base
    uniq: list = []
    base_of: list = []
    pos_of: dict = {}

    def row_for(v: int, b: int) -> int:
        if v not in pos_of:
            uniq.append(v)
            base_of.append(b)
            pos_of[v] = len(uniq) - 1
        return pos_of[v]

    want = np.empty(len(offsets), dtype=np.int64)
    for k, v in enumerate(offsets):
        v = int(v)
        if (int(vr[v]) & 6) == 2:
            b = v - 1
            while (int(vr[b]) & 6) == 2:
                b -= 1
            bi = row_for(b, -1)
            want[k] = row_for(v, bi)
        else:
            want[k] = row_for(v, -1)

    U = len(uniq)
    B = len(offsets)
    uniq_a = np.asarray(uniq, dtype=np.int64)
    base_a = np.asarray(base_of, dtype=np.int64)
    fpos_a = np.ascontiguousarray(fpos, dtype=np.uint64)
    vr_a = np.ascontiguousarray(vrtypes, dtype=np.uint8)
    codes_buf = np.empty((U, n_samples), dtype=np.uint8)
    out = np.empty((B, n_samples), dtype=np.float64)
    nfail = lib.pgen_decode_block(
        data, fpos_a.ctypes.data, vr_a.ctypes.data, uniq_a.ctypes.data,
        base_a.ctypes.data, ctypes.c_int64(U), ctypes.c_int64(n_samples),
        want.ctypes.data, ctypes.c_int64(B), codes_buf.ctypes.data,
        out.ctypes.data,
    )
    if nfail > 0:
        return None
    return out
