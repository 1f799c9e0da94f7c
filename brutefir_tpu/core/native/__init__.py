"""ctypes loader/builder for the native codec (codec.cpp).

Compiles the shared object on first import (g++ -O3) and caches it next to
the source; falls back cleanly (available() -> False) when no compiler is
present so the pure-numpy paths take over.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "codec.cpp")
_SO = os.path.join(_DIR, f"_codec_{sys.platform}.so")

_lib = None
_tried = False


class OvfStatsC(ctypes.Structure):
    _fields_ = [("n_overflows", ctypes.c_uint32),
                ("intlargest", ctypes.c_int32),
                ("largest", ctypes.c_double)]


def _build() -> bool:
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
                   "-o", _SO + ".tmp", _SRC]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(_SO + ".tmp", _SO)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    c = ctypes
    u8p, f32p, i32p, f64p = (np.ctypeslib.ndpointer(dtype=d, flags="C_CONTIGUOUS")
                             for d in (np.uint8, np.float32, np.int32, np.float64))
    lib.bf_decode_f32.argtypes = [u8p, f32p, c.c_int64, c.c_int32, i32p,
                                  c.c_int32, c.c_int32, c.c_int32, c.c_int32]
    lib.bf_quantize_nd.argtypes = [f32p, c.c_int64, c.c_int32, i32p,
                                   c.POINTER(OvfStatsC)]
    lib.bf_quantize_dither.argtypes = [f32p, f32p, c.c_int64, c.c_int32,
                                       f32p, i32p, c.POINTER(OvfStatsC)]
    lib.bf_quantize_nd_rows.argtypes = [f32p, c.c_int32, c.c_int64, c.c_int32,
                                        i32p, c.POINTER(OvfStatsC)]
    lib.bf_encode_int.argtypes = [i32p, u8p, c.c_int64, c.c_int32, i32p,
                                  c.c_int32, c.c_int32, c.c_int32]
    lib.bf_encode_float.argtypes = [f32p, u8p, c.c_int64, c.c_int32, i32p,
                                    c.c_int32, c.c_int32, c.c_int32, f64p,
                                    c.POINTER(OvfStatsC)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _swap_flag(fmt) -> int:
    return int(fmt.little_endian != (sys.byteorder == "little"))


def decode_f32(raw: np.ndarray, fmt, n_frames: int, open_channels: int,
               channel_selection) -> np.ndarray:
    lib = _load()
    sel = np.ascontiguousarray(channel_selection, dtype=np.int32)
    out = np.empty((len(sel), n_frames), dtype=np.float32)
    need = n_frames * open_channels * fmt.bytes
    buf = np.ascontiguousarray(raw[:need])
    # the C walks need bytes unconditionally and loads word-sized --
    # validate what the numpy fallback's reshape would have caught, and
    # realign odd-offset views (fresh numpy allocations are aligned)
    if buf.nbytes < need:
        raise ValueError(
            f"decode_f32: raw buffer holds {buf.nbytes} of {need} bytes")
    if fmt.bytes in (2, 4, 8) and buf.ctypes.data % fmt.bytes:
        buf = buf.copy()
    lib.bf_decode_f32(buf, out, n_frames, open_channels, sel, len(sel),
                      fmt.bytes, int(fmt.is_float), _swap_flag(fmt))
    return out


def _sync_stats(cst: OvfStatsC, overflow) -> None:
    overflow.n_overflows = int(cst.n_overflows)
    overflow.intlargest = int(cst.intlargest)
    overflow.largest = float(cst.largest)


def _make_stats(overflow) -> OvfStatsC:
    return OvfStatsC(overflow.n_overflows, overflow.intlargest, overflow.largest)


def quantize_no_dither(x: np.ndarray, fmt, overflow) -> np.ndarray:
    lib = _load()
    q = np.empty(x.shape[-1] if x.ndim == 1 else x.shape, dtype=np.int32)
    cst = _make_stats(overflow)
    lib.bf_quantize_nd(np.ascontiguousarray(x, np.float32), x.size,
                       fmt.bits, q.reshape(-1), ctypes.byref(cst))
    _sync_stats(cst, overflow)
    return q


def dither_quantize(x: np.ndarray, dith: np.ndarray, sf: np.ndarray, fmt,
                    overflow) -> np.ndarray:
    lib = _load()
    q = np.empty(x.shape[0], dtype=np.int32)
    cst = _make_stats(overflow)
    lib.bf_quantize_dither(np.ascontiguousarray(x, np.float32),
                           np.ascontiguousarray(dith, np.float32),
                           x.shape[0], fmt.bits, sf, q, ctypes.byref(cst))
    _sync_stats(cst, overflow)
    return q


def quantize_rows_no_dither(x: np.ndarray, fmt, overflows) -> np.ndarray:
    """Quantize [n_rows, n] in one call; overflows is one Overflow per row."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    q = np.empty(x.shape, dtype=np.int32)
    stats = (OvfStatsC * len(overflows))(*[_make_stats(o) for o in overflows])
    lib.bf_quantize_nd_rows(x, x.shape[0], x.shape[1], fmt.bits,
                            q, ctypes.cast(stats, ctypes.POINTER(OvfStatsC)))
    for i, o in enumerate(overflows):
        _sync_stats(stats[i], o)
    return q


def _check_out(out: np.ndarray, n_frames: int, open_channels: int,
               fmt) -> None:
    need = n_frames * open_channels * fmt.bytes
    if out.nbytes < need:
        raise ValueError(
            f"encode: out buffer holds {out.nbytes} of {need} bytes")
    if fmt.bytes in (2, 4, 8) and out.ctypes.data % fmt.bytes:
        raise ValueError("encode: out buffer is not word-aligned")


def encode_int(rows_q: np.ndarray, fmt, open_channels: int, channel_selection,
               out: np.ndarray) -> None:
    lib = _load()
    sel = np.ascontiguousarray(channel_selection, dtype=np.int32)
    _check_out(out, rows_q.shape[1], open_channels, fmt)
    lib.bf_encode_int(np.ascontiguousarray(rows_q, np.int32), out,
                      rows_q.shape[1], open_channels, sel, len(sel),
                      fmt.bytes, _swap_flag(fmt))


def encode_float(rows: np.ndarray, fmt, open_channels: int, channel_selection,
                 out: np.ndarray, overflows) -> None:
    lib = _load()
    sel = np.ascontiguousarray(channel_selection, dtype=np.int32)
    maxes = np.array([o.max for o in overflows], dtype=np.float64)
    stats = (OvfStatsC * len(overflows))(
        *[_make_stats(o) for o in overflows])
    _check_out(out, rows.shape[1], open_channels, fmt)
    lib.bf_encode_float(np.ascontiguousarray(rows, np.float32), out,
                        rows.shape[1], open_channels, sel, len(sel),
                        fmt.bytes, _swap_flag(fmt), maxes,
                        ctypes.cast(stats, ctypes.POINTER(OvfStatsC)))
    for i, o in enumerate(overflows):
        _sync_stats(stats[i], o)
