"""Optional native (C via ctypes) kernels for bitstream-serial hot loops.

The engine's Arrow kernels hand whole batches to vectorized numpy wherever
the work is data-parallel (the §4.2 sweet spot).  A few codec inner loops
are *bitstream-serial* — each step's length depends on the previous symbol
— so they cannot be vectorized and run as per-symbol Python loops (the
JPEG entropy walk was measured at ~0.5 ms/frame, >80% of the MJPEG video
stat kernel).  For exactly those loops this module compiles a tiny
dependency-free C translation unit at first use with the system C
compiler and loads it through ctypes.

Design rules:

* the C function is a LINE-FOR-LINE translation of the pure-Python loop
  it replaces (same state machine, same truncation/overrun guards), and
  the Python loop stays in the codebase as the always-available fallback;
* any C-side error (nonzero return) re-runs the Python path so error
  MESSAGES and exception types are byte-identical to the fallback;
* compilation is attempted once per process, guarded by a file lock, and
  cached under /tmp keyed on the source hash — concurrent Python workers
  share one build; a missing compiler or failed build silently selects
  the Python path (a warning is recorded on this module for tests).

Everything here is public knowledge: ITU-T T.81 for the JPEG scan
structure, the C89 standard library, and the ctypes module docs.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdint.h>

/* Baseline-JPEG entropy-coded scan walk: decode `nblocks` 8x8 blocks'
 * zigzag coefficients from an UNSTUFFED entropy segment.  Mirrors
 * jpeg.py's _BitReader/decode loop exactly, including the zero-padded
 * peek past end-of-data and the consumed-bits truncation guard.
 *
 * dc_sym/ac_sym: 65536-entry int16 prefix LUTs (-1 = invalid code);
 * dc_len/ac_len: matching uint8 code lengths.
 * zz: nblocks*64 int32, caller-zeroed.  dc_in: DPCM predictor coming in
 * (0 at scan/restart start).  Returns the outgoing predictor (>= -32768)
 * on success or a negative error code < -100000 on any malformed input
 * (caller falls back to the Python decoder for exact error semantics).
 */
#define ERR (-1000000)
long jpeg_decode_scan(const unsigned char *d, long n,
                      const int16_t *dc_sym, const uint8_t *dc_len,
                      const int16_t *ac_sym, const uint8_t *ac_len,
                      long nblocks, int32_t *zz, long dc_in)
{
    uint32_t acc = 0;
    long nbits = 0, pos = 0, filled = 0;
    long dc_prev = dc_in;
    long bi, total_bits = n * 8;

#define FILL(need)                                                       \
    while (nbits < (need)) {                                             \
        uint32_t b = (pos < n) ? d[pos] : 0u;                            \
        pos++;                                                           \
        acc = ((acc & 0xFFFFFFu) << 8) | b;                              \
        nbits += 8;                                                      \
        filled += 8;                                                     \
    }
#define OVERRUN() (filled - nbits > total_bits)

    for (bi = 0; bi < nblocks; bi++) {
        uint32_t p;
        int32_t *row = zz + bi * 64;
        int s, k;
        FILL(16);
        p = (acc >> (nbits - 16)) & 0xFFFFu;
        s = dc_sym[p];
        if (s < 0)
            return ERR - 1; /* invalid DC Huffman code */
        nbits -= dc_len[p];
        if (nbits < 0 || OVERRUN())
            return ERR - 2; /* truncated stream */
        if (s) {
            long v;
            FILL(s);
            nbits -= s;
            if (OVERRUN())
                return ERR - 2;
            v = (acc >> nbits) & ((1u << s) - 1u);
            if (v < (1L << (s - 1)))
                v = v - (1L << s) + 1;
            dc_prev += v;
        }
        row[0] = (int32_t)dc_prev;
        k = 1;
        while (k < 64) {
            int sym, sz;
            FILL(16);
            p = (acc >> (nbits - 16)) & 0xFFFFu;
            sym = ac_sym[p];
            if (sym < 0)
                return ERR - 1; /* invalid AC Huffman code */
            nbits -= ac_len[p];
            if (nbits < 0 || OVERRUN())
                return ERR - 2;
            if (sym == 0x00) /* EOB */
                break;
            if (sym == 0xF0) { /* ZRL */
                k += 16;
                continue;
            }
            k += sym >> 4;
            sz = sym & 0x0F;
            if (k >= 64)
                return ERR - 3; /* AC run past block end */
            if (sz == 0)
                return ERR - 4; /* undefined run/size (Python raises too) */
            {
                long v;
                FILL(sz);
                nbits -= sz;
                if (OVERRUN())
                    return ERR - 2;
                v = (acc >> nbits) & ((1u << sz) - 1u);
                if (v < (1L << (sz - 1)))
                    v = v - (1L << sz) + 1;
                row[k] = (int32_t)v;
            }
            k++;
        }
    }
    return dc_prev;
}
"""

_CACHE_ROOT = os.environ.get("SPARK_GRAFT_NATIVE_DIR", "/tmp/spark_graft_native")

_lib = None
_lib_tried = False
build_error: str | None = None  # inspected by tests


def _build() -> ctypes.CDLL | None:
    """Compile (once, machine-wide) and load the kernel library."""
    global build_error
    digest = hashlib.md5(_C_SRC.encode()).hexdigest()[:16]
    so_path = os.path.join(_CACHE_ROOT, f"kernels_{digest}.so")
    if not os.path.exists(so_path):
        try:
            os.makedirs(_CACHE_ROOT, exist_ok=True)
            # exclusive build lock: many Python workers import this module
            # concurrently; exactly one compiles, the rest wait on flock
            import fcntl

            with open(os.path.join(_CACHE_ROOT, f"build_{digest}.lock"), "w") as lk:
                fcntl.flock(lk, fcntl.LOCK_EX)
                if not os.path.exists(so_path):
                    with tempfile.TemporaryDirectory(dir=_CACHE_ROOT) as td:
                        src = os.path.join(td, "kernels.c")
                        with open(src, "w") as fh:
                            fh.write(_C_SRC)
                        tmp_so = os.path.join(td, "kernels.so")
                        subprocess.run(
                            ["cc", "-O2", "-fPIC", "-shared", "-o", tmp_so, src],
                            check=True,
                            capture_output=True,
                            timeout=120,
                        )
                        os.rename(tmp_so, so_path)  # atomic publish
        except Exception as exc:  # no compiler / read-only tmp / race loss
            build_error = f"{type(exc).__name__}: {exc}"
            return None
    try:
        lib = ctypes.CDLL(so_path)
        lib.jpeg_decode_scan.restype = ctypes.c_long
        lib.jpeg_decode_scan.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long,
        ]
        return lib
    except Exception as exc:
        build_error = f"{type(exc).__name__}: {exc}"
        return None


def get_lib() -> ctypes.CDLL | None:
    """The compiled kernel library, or None if unavailable (use fallback)."""
    global _lib, _lib_tried
    if not _lib_tried:
        _lib = _build()
        _lib_tried = True
    return _lib


# LUT arrays are module-memoized in jpeg.py (_LUT_CACHE), so their ctypes
# pointers can be cached too — data_as() was ~25 us/frame of pure wrapper
# overhead.  The cache holds a reference to each array, pinning it so the
# pointer can never dangle.
_PTR_CACHE: dict[int, tuple[np.ndarray, object]] = {}


def _ptr(arr: np.ndarray, ctype) -> object:
    hit = _PTR_CACHE.get(id(arr))
    if hit is None or hit[0] is not arr:
        hit = (arr, arr.ctypes.data_as(ctypes.POINTER(ctype)))
        _PTR_CACHE[id(arr)] = hit
    return hit[1]


def jpeg_decode_scan(
    body: bytes,
    dc_sym: np.ndarray,
    dc_len: np.ndarray,
    ac_sym: np.ndarray,
    ac_len: np.ndarray,
    nblocks: int,
    zz: np.ndarray,
    bi0: int,
    dc_in: int,
) -> int | None:
    """Decode ``nblocks`` blocks from an unstuffed entropy segment into
    ``zz[bi0:bi0+nblocks]`` (int32 (N, 64) zigzag rows, pre-zeroed).

    Returns the outgoing DC predictor, or None when the native library is
    unavailable or the stream is malformed — callers must then run the
    pure-Python decoder (which either succeeds or raises the canonical
    error)."""
    lib = get_lib()
    if lib is None:
        return None
    out = zz[bi0 : bi0 + nblocks]
    rc = lib.jpeg_decode_scan(
        body,
        len(body),
        _ptr(dc_sym, ctypes.c_int16),
        _ptr(dc_len, ctypes.c_uint8),
        _ptr(ac_sym, ctypes.c_int16),
        _ptr(ac_len, ctypes.c_uint8),
        nblocks,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dc_in,
    )
    if rc <= -1000000:
        out[:] = 0  # leave zz clean for the Python fallback pass
        return None
    return int(rc)
