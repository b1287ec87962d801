"""ctypes bindings for the native sample-log engine (sample_log.cpp).

Builds ``libmlmc_native.so`` on first use via the Makefile (g++ is part of
the toolchain); all consumers gate on ``available()`` so the pure-Python
backends keep working if no compiler is present.
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmlmc_native.so")
_lib = None
_lock = threading.Lock()
_build_error = None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH) or (
                    os.path.getmtime(_LIB_PATH)
                    < os.path.getmtime(os.path.join(_DIR, "sample_log.cpp"))):
                subprocess.run(["make", "-C", _DIR], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception as e:  # no compiler / load failure -> gate off
            _build_error = e
            return None

        lib.mlmc_writer_open.restype = ctypes.c_void_p
        lib.mlmc_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
        lib.mlmc_writer_append.restype = ctypes.c_int64
        lib.mlmc_writer_append.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_uint64]
        lib.mlmc_writer_flush.restype = ctypes.c_int
        lib.mlmc_writer_flush.argtypes = [ctypes.c_void_p]
        lib.mlmc_writer_close.argtypes = [ctypes.c_void_p]

        lib.mlmc_reader_open.restype = ctypes.c_void_p
        lib.mlmc_reader_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.mlmc_reader_n_records.restype = ctypes.c_uint64
        lib.mlmc_reader_n_records.argtypes = [ctypes.c_void_p]
        lib.mlmc_reader_m.restype = ctypes.c_uint32
        lib.mlmc_reader_m.argtypes = [ctypes.c_void_p]
        lib.mlmc_reader_read.restype = ctypes.c_int64
        lib.mlmc_reader_read.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_double)]
        lib.mlmc_reader_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available():
    return _load() is not None


def build_error():
    _load()
    return _build_error


class SampleLogWriter:
    """Append-only [n, 2, M] float64 record writer."""

    def __init__(self, path, m):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native engine unavailable: {}".format(_build_error))
        self._lib = lib
        self._handle = lib.mlmc_writer_open(path.encode(), int(m))
        if not self._handle:
            raise IOError("cannot open sample log for writing: {}".format(path))
        self.m = int(m)

    def append(self, values):
        """:param values: array-like [n, 2, M] float64"""
        values = np.ascontiguousarray(values, dtype=np.float64)
        assert values.ndim == 3 and values.shape[1] == 2 \
            and values.shape[2] == self.m, values.shape
        n = self._lib.mlmc_writer_append(
            self._handle,
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            values.shape[0])
        if n != values.shape[0]:
            raise IOError("short write to sample log")
        return int(n)

    def flush(self):
        self._lib.mlmc_writer_flush(self._handle)

    def close(self):
        if self._handle:
            self._lib.mlmc_writer_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class SampleLogReader:
    """mmap reader with background page prefetch."""

    def __init__(self, path, prefetch_ahead_records=1 << 16):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native engine unavailable: {}".format(_build_error))
        self._lib = lib
        self._handle = lib.mlmc_reader_open(path.encode(),
                                            int(prefetch_ahead_records))
        if not self._handle:
            raise IOError("cannot open sample log for reading: {}".format(path))
        self.m = int(lib.mlmc_reader_m(self._handle))

    @property
    def n_records(self):
        return int(self._lib.mlmc_reader_n_records(self._handle))

    def read(self, start, n):
        """:return: np.ndarray [n', 2, M] (n' may be clipped at EOF)"""
        out = np.empty((n, 2, self.m), dtype=np.float64)
        got = self._lib.mlmc_reader_read(
            self._handle, int(start), int(n),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if got < 0:
            raise IOError("sample log read failed")
        return out[:got]

    def close(self):
        if self._handle:
            self._lib.mlmc_reader_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
