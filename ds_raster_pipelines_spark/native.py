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

/* Multi-segment form of jpeg_decode_scan: decode nseg independent
 * entropy segments (each with its own DPCM predictor reset — i.e. one
 * whole no-restart frame per segment) in ONE call, amortizing the
 * foreign-call overhead that dominated per-frame decodes.  seg_off has
 * nseg+1 entries into the concatenated UNSTUFFED bodies; seg_blocks[i]
 * blocks are written at zz + zz_off[i]*64.  Returns 0 or the first
 * segment's error code (caller falls back per frame).
 */
long jpeg_decode_scan_multi(const unsigned char *data, const int64_t *seg_off,
                            const int64_t *seg_blocks, const int64_t *zz_off,
                            long nseg,
                            const int16_t *dc_sym, const uint8_t *dc_len,
                            const int16_t *ac_sym, const uint8_t *ac_len,
                            int32_t *zz)
{
    long i;
    for (i = 0; i < nseg; i++) {
        long rc = jpeg_decode_scan(data + seg_off[i],
                                   seg_off[i + 1] - seg_off[i],
                                   dc_sym, dc_len, ac_sym, ac_len,
                                   seg_blocks[i], zz + zz_off[i] * 64, 0);
        if (rc <= -1000000)
            return rc;
    }
    return 0;
}

/* Dequantize + inverse DCT + epilogue for a stack of 8x8 blocks, the
 * per-block form of jpeg.py's _pixels_from_zz: for every block,
 * P = sum over nonzero zigzag coefficients k of
 *     (zz[k] * q[raster(k)]) * basis[raster(k)]   (+ 128, rint, clip).
 * basis row r is the flattened outer product D[u,:] (x) D[v,:] for
 * r = u*8 + v (the exact algebraic expansion of D^T C D), supplied by
 * the caller from the SAME _DCT_D the numpy path uses.  Skipping zero
 * coefficients is exact (their term is exactly 0.0), and the corpus
 * frames carry ~3 nonzeros per block, so this does ~200 flops/block
 * where the dense matmul pair does 1024 plus numpy dispatch.
 * rint() honors the default round-half-to-even mode == np.rint.
 */
#include <math.h>
/* Writes each 8x8 block STRAIGHT INTO its frame's raster layout: block
 * bi belongs to frame bi / bpf at block row/col (b / nbx, b % nbx), so
 * the numpy side needs no reshape/swapaxes copy at all (frames come out
 * as (nframes, nby*8, nbx*8) uint8, crop-by-view downstream). */
long jpeg_idct_blocks(const int32_t *zz, long nblocks,
                      const int32_t *q,          /* 64, raster order */
                      const double *basis,       /* 64*64, row-major */
                      const unsigned char *zz2r, /* zigzag k -> raster r */
                      long nbx, long bpf,        /* blocks per row / frame */
                      unsigned char *out)        /* nblocks*64, frame layout */
{
    long bi;
    long wpx = nbx * 8;
    for (bi = 0; bi < nblocks; bi++) {
        const int32_t *row = zz + bi * 64;
        long f = bi / bpf, b = bi % bpf;
        unsigned char *px =
            out + f * bpf * 64 + (b / nbx) * 8 * wpx + (b % nbx) * 8;
        double acc[64];
        int k, m, r2, c2;
        for (m = 0; m < 64; m++)
            acc[m] = 0.0;
        for (k = 0; k < 64; k++) {
            int32_t c = row[k];
            if (c) {
                int r = zz2r[k];
                double v = (double)c * (double)q[r];
                const double *bas = basis + r * 64;
                for (m = 0; m < 64; m++)
                    acc[m] += v * bas[m];
            }
        }
        /* branch-free epilogue so the compiler can use packed round/
         * min/max (the branchy clip form ran one scalar round + two
         * compares + a branch per pixel and dominated the kernel) */
        for (m = 0; m < 64; m++) {
            double p = rint(acc[m] + 128.0);
            p = p < 0.0 ? 0.0 : p;
            p = p > 255.0 ? 255.0 : p;
            acc[m] = p;
        }
        {
            unsigned char blk[64];
            for (m = 0; m < 64; m++)
                blk[m] = (unsigned char)acc[m];
            for (r2 = 0; r2 < 8; r2++)
                for (c2 = 0; c2 < 8; c2++)
                    px[r2 * wpx + c2] = blk[r2 * 8 + c2];
        }
    }
    return 0;
}

/* GRIB2 multi-message header scan: mirrors grib.py scan_messages —
 * sections 0/3/4/5/6/7 field extraction at fixed offsets, data kept
 * packed.  Returns the message count, or a negative error code for ANY
 * condition the Python scanner would raise on OR any variant this
 * subset does not cover (caller then re-runs the Python scanner for
 * exact behavior/messages).  Per message NSLOT int64 slots + 1 double:
 *  [0]=offset [1]=length [2]=discipline [3]=param_category
 *  [4]=param_number [5]=template [6]=forecast_time [7]=perturbation
 *  [8]=n_ens [9]=ni [10]=nj [11]=lat1_mdeg [12]=lon1_mdeg [13]=di_mdeg
 *  [14]=dj_mdeg [15]=n_points [16]=packing_template [17]=bits_per_value
 *  [18]=bitmap_offset(-1 none) [19]=data_offset [20]=data_len
 *  [21]=s5_offset [22]=binary_scale [23]=decimal_scale; ref_value in
 *  refs[i].
 */
#define GERR (-2000000)
#define NSLOT 24
static uint32_t rd32(const unsigned char *d) {
    return ((uint32_t)d[0] << 24) | ((uint32_t)d[1] << 16) |
           ((uint32_t)d[2] << 8) | d[3];
}
static uint16_t rd16(const unsigned char *d) {
    return (uint16_t)(((uint16_t)d[0] << 8) | d[1]);
}
long grib_scan(const unsigned char *buf, long n, long max_msgs,
               int64_t *out, double *refs)
{
    long pos = 0, mi = 0;
    while (pos < n) {
        int64_t *m;
        long end, p;
        int seen = 0;
        uint64_t mlen;
        if (mi >= max_msgs)
            return GERR - 9;
        if (pos + 16 > n || buf[pos] != 'G' || buf[pos + 1] != 'R' ||
            buf[pos + 2] != 'I' || buf[pos + 3] != 'B')
            return GERR - 1; /* no GRIB indicator */
        if (buf[pos + 7] != 2)
            return GERR - 2; /* edition != 2 */
        m = out + mi * NSLOT;
        m[0] = pos;
        m[2] = buf[pos + 6];
        mlen = 0;
        {
            int k;
            for (k = 0; k < 8; k++)
                mlen = (mlen << 8) | buf[pos + 8 + k];
        }
        if (mlen < 20 || pos + (long)mlen > n)
            return GERR - 3;
        m[1] = (int64_t)mlen;
        end = pos + (long)mlen;
        p = pos + 16;
        m[7] = 0;   /* perturbation default (template 0) */
        m[8] = 1;   /* n_ens default */
        m[16] = 0;  /* packing_template default */
        m[18] = -1; /* no bitmap */
        while (p < end - 4) {
            long slen, body;
            int snum;
            if (p + 5 > n)
                return GERR - 3;
            slen = rd32(buf + p);
            snum = buf[p + 4];
            body = p + 5;
            if (slen < 5 || p + slen > end)
                return GERR - 3;
            if (snum == 3) {
                long g;
                if (rd16(buf + body + 7) != 0)
                    return GERR - 4; /* grid template != 0 */
                g = body + 9 + 16;
                m[9] = rd32(buf + g);
                m[10] = rd32(buf + g + 4);
                g += 16;
                m[11] = (int32_t)rd32(buf + g);   /* La1, signed */
                m[12] = rd32(buf + g + 4);        /* Lo1 */
                g += 17;
                m[13] = rd32(buf + g);
                m[14] = rd32(buf + g + 4);
                seen |= 1;
            } else if (snum == 4) {
                long t;
                int tmpl = rd16(buf + body + 2);
                if (tmpl != 0 && tmpl != 1)
                    return GERR - 5; /* product template unsupported */
                m[5] = tmpl;
                t = body + 4;
                m[3] = buf[t];
                m[4] = buf[t + 1];
                m[6] = rd32(buf + t + 9);
                if (tmpl == 1) {
                    m[7] = buf[t + 26];
                    m[8] = buf[t + 27];
                }
                seen |= 2;
            } else if (snum == 5) {
                int tmpl;
                m[15] = rd32(buf + body);
                tmpl = rd16(buf + body + 4);
                if (tmpl != 0 && tmpl != 2 && tmpl != 3)
                    return GERR - 6; /* packing template unsupported */
                m[16] = tmpl;
                m[21] = body;
                {
                    union { uint32_t u; float f; } cv;
                    cv.u = rd32(buf + body + 6);
                    refs[mi] = (double)cv.f;
                }
                m[22] = (int16_t)rd16(buf + body + 10);
                m[23] = (int16_t)rd16(buf + body + 12);
                m[17] = buf[body + 14];
                seen |= 4;
            } else if (snum == 6) {
                int ind = buf[body];
                if (ind == 255)
                    m[18] = -1;
                else if (ind == 0)
                    m[18] = body + 1;
                else
                    return GERR - 7; /* pre-defined bitmap unsupported */
            } else if (snum == 7) {
                m[19] = body;
                m[20] = slen - 5;
                seen |= 8;
            }
            p += slen;
        }
        if (buf[end - 4] != '7' || buf[end - 3] != '7' ||
            buf[end - 2] != '7' || buf[end - 1] != '7')
            return GERR - 8; /* missing 7777 terminator */
        if (seen != 15)
            return GERR - 10; /* a section this subset requires is absent */
        mi++;
        pos = end;
    }
    return mi;
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
                        # -march=native: inline rint() as a rounding insn
                        # (a libm CALL per pixel at baseline -O2 dominated
                        # the IDCT kernel); -ffp-contract=off: NO fma
                        # contraction — the sparse-IDCT sums must round
                        # every multiply-add like the numpy path does
                        # (byte-parity pytest); -fno-math-errno: allow the
                        # inline form (results unchanged for finite args).
                        cmd = [
                            "cc", "-O2", "-march=native", "-ffp-contract=off",
                            "-fno-math-errno", "-fPIC", "-shared",
                            "-o", tmp_so, src, "-lm",
                        ]
                        try:
                            subprocess.run(
                                cmd, check=True, capture_output=True, timeout=120
                            )
                        except subprocess.CalledProcessError:
                            # pre--march=native toolchains: portable build
                            subprocess.run(
                                [a for a in cmd if a != "-march=native"],
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
        lib.jpeg_decode_scan_multi.restype = ctypes.c_long
        lib.jpeg_decode_scan_multi.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.jpeg_idct_blocks.restype = ctypes.c_long
        lib.jpeg_idct_blocks.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.grib_scan.restype = ctypes.c_long
        lib.grib_scan.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
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


def jpeg_idct_blocks(
    zz: np.ndarray,
    q_raster: np.ndarray,
    basis: np.ndarray,
    zz_to_raster: bytes,
    nbx: int,
    blocks_per_frame: int,
    out: np.ndarray,
) -> bool:
    """Dequant + IDCT + (+128, rint, clip) for a (N, 64) int32 zigzag
    stack, written straight into ``out`` = (nframes, nby*8, nbx*8) uint8
    frame layout (no numpy reshape/swapaxes pass needed).  Returns False
    when the native library is unavailable — callers run the numpy
    matmul path instead.  ``basis`` must be the 64x64 float64 outer-
    product expansion of the SAME DCT matrix the numpy path uses (the
    parity pytest pins byte-equality between the two paths)."""
    lib = get_lib()
    if lib is None:
        return False
    lib.jpeg_idct_blocks(
        zz.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        zz.shape[0],
        _ptr(q_raster, ctypes.c_int32),
        _ptr(basis, ctypes.c_double),
        zz_to_raster,
        nbx,
        blocks_per_frame,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return True


GRIB_SCAN_SLOTS = 24


def grib_scan(buf: bytes, max_msgs: int = 4096):
    """Scan GRIB2 message headers natively.  Returns (fields, refs) —
    int64 (n_msgs, 24) + float64 (n_msgs,) — or None when the library is
    unavailable or the file needs the Python scanner (unsupported
    variant / malformed stream: the caller re-runs grib.scan_messages
    for exact error behavior)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((max_msgs, GRIB_SCAN_SLOTS), dtype=np.int64)
    refs = np.zeros(max_msgs, dtype=np.float64)
    rc = lib.grib_scan(
        buf,
        len(buf),
        max_msgs,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        refs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc < 0:
        return None
    return out[:rc], refs[:rc]


def jpeg_decode_scan_multi(
    bodies: bytes,
    seg_off: np.ndarray,
    seg_blocks: np.ndarray,
    zz_off: np.ndarray,
    dc_sym: np.ndarray,
    dc_len: np.ndarray,
    ac_sym: np.ndarray,
    ac_len: np.ndarray,
    zz: np.ndarray,
) -> bool:
    """Decode many no-restart frames' scans in one native call.  False
    means unavailable/malformed — caller re-runs the per-frame path
    (which itself falls back to pure Python with exact errors)."""
    lib = get_lib()
    if lib is None:
        return False
    rc = lib.jpeg_decode_scan_multi(
        bodies,
        seg_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        seg_blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        zz_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(seg_blocks),
        _ptr(dc_sym, ctypes.c_int16),
        _ptr(dc_len, ctypes.c_uint8),
        _ptr(ac_sym, ctypes.c_int16),
        _ptr(ac_len, ctypes.c_uint8),
        zz.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc <= -1000000:
        zz[:] = 0
        return False
    return True
