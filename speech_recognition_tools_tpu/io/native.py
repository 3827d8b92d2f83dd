"""ctypes bindings to the C++ native runtime components (native/*.cpp):
the PESQ (P.862-style) scorer and the fast binary-ark reader.

The shared library is built on demand with g++ (cached in native/build/);
everything degrades gracefully to pure-Python paths when a toolchain is
unavailable.
"""

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_LIB = None


def _build_library():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    sources = [
        os.path.join(_NATIVE_DIR, "pesq.cpp"),
        os.path.join(_NATIVE_DIR, "ark_io.cpp"),
        os.path.join(_NATIVE_DIR, "fst_decode.cpp"),
    ]
    out = os.path.join(_BUILD_DIR, "libsrtnative.so")
    newest_src = max(os.path.getmtime(s) for s in sources)
    if os.path.exists(out) and os.path.getmtime(out) >= newest_src:
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out] + sources
    subprocess.run(cmd, check=True)
    return out


def get_native_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB
    if _LIB is not None:
        return _LIB
    try:
        path = _build_library()
        lib = ctypes.CDLL(path)
    except Exception:
        return None
    lib.pesq_mos.restype = ctypes.c_double
    lib.pesq_mos.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
    ]
    lib.ark_open.restype = ctypes.c_void_p
    lib.ark_open.argtypes = [ctypes.c_char_p]
    lib.ark_next.restype = ctypes.c_int
    lib.ark_next.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.ark_read_f32.restype = ctypes.c_int
    lib.ark_read_f32.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
    ]
    lib.ark_skip.restype = ctypes.c_int
    lib.ark_skip.argtypes = [ctypes.c_void_p]
    lib.ark_close.argtypes = [ctypes.c_void_p]
    lib.fst_load.restype = ctypes.c_void_p
    lib.fst_load.argtypes = [ctypes.c_char_p]
    lib.fst_free.argtypes = [ctypes.c_void_p]
    lib.fst_num_states.restype = ctypes.c_int32
    lib.fst_num_states.argtypes = [ctypes.c_void_p]
    lib.fst_num_arcs.restype = ctypes.c_int64
    lib.fst_num_arcs.argtypes = [ctypes.c_void_p]
    lib.fst_decode.restype = ctypes.c_int32
    lib.fst_decode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32, ctypes.c_int32,
        ctypes.c_float, ctypes.c_float, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.fst_decode_nbest.restype = ctypes.c_int32
    lib.fst_decode_nbest.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32, ctypes.c_int32,
        ctypes.c_float, ctypes.c_float, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return lib


def pesq(reference, degraded, fs: float):
    """PESQ-style MOS of `degraded` against `reference` (native C++).

    Raises RuntimeError if the native library can't be built.
    """
    lib = get_native_lib()
    if lib is None:
        raise RuntimeError("native library unavailable (g++ missing?)")
    ref = np.ascontiguousarray(reference, np.float64)
    deg = np.ascontiguousarray(degraded, np.float64)
    mos = lib.pesq_mos(
        ref.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(ref),
        deg.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(deg),
        float(fs),
    )
    if mos < -100:
        raise ValueError("signals too short for PESQ")
    return float(mos)


def read_ark_native(path):
    """Yield (key, float32 matrix) from a binary ark via the C++ reader;
    falls back to the pure-Python reader when the toolchain is missing."""
    lib = get_native_lib()
    if lib is None:
        from speech_recognition_tools_tpu.io.kaldi_ark import read_ark

        yield from read_ark(path)
        return
    handle = lib.ark_open(path.encode())
    if not handle:
        raise FileNotFoundError(path)
    key_buf = ctypes.create_string_buffer(1024)
    rows = ctypes.c_int32()
    cols = ctypes.c_int32()
    try:
        while True:
            status = lib.ark_next(handle, key_buf, 1024,
                                  ctypes.byref(rows), ctypes.byref(cols))
            if status == 0:
                return
            if status < 0:
                raise ValueError(f"bad ark entry in {path}")
            mat = np.empty((rows.value, cols.value), np.float32)
            if lib.ark_read_f32(
                handle, mat.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            ):
                raise ValueError(f"short read in {path}")
            yield key_buf.value.decode(), mat
    finally:
        lib.ark_close(handle)
