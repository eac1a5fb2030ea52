"""ctypes binding for the native threaded .npy loader (native/npy_loader.cc).

`NativePrefetcher` reads batches of feature files on a C++ worker pool and
supports submit-ahead: the next group loads while the TPU runs the current
step. Falls back transparently to numpy when the shared library isn't built
(`make -C native`).
"""

import ctypes
import os

import numpy as np

_DTYPES = {0: np.float32, 1: np.float64, 2: np.int32, 3: np.int64,
           4: np.uint8}
_ITEM = {0: 4, 1: 8, 2: 4, 3: 8, 4: 1}

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "libctts_io.so")


def _load_lib():
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ctts_pool_create.restype = ctypes.c_void_p
    lib.ctts_pool_create.argtypes = [ctypes.c_int]
    lib.ctts_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.ctts_submit.restype = ctypes.c_long
    lib.ctts_submit.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_char_p),
                                ctypes.c_int]
    lib.ctts_job_ready.restype = ctypes.c_int
    lib.ctts_job_ready.argtypes = [ctypes.c_void_p, ctypes.c_long]
    lib.ctts_array_info.restype = ctypes.c_int
    lib.ctts_array_info.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                    ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_long),
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int)]
    lib.ctts_array_copy.restype = ctypes.c_long
    lib.ctts_array_copy.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                    ctypes.c_int, ctypes.c_void_p,
                                    ctypes.c_long]
    lib.ctts_job_free.argtypes = [ctypes.c_void_p, ctypes.c_long]
    return lib


_lib = _load_lib()


def available():
    return _lib is not None


def build(verbose=False):
    """Compile the shared library in-place (requires g++)."""
    import subprocess
    native_dir = os.path.dirname(_LIB_PATH)
    r = subprocess.run(["make", "-C", native_dir],
                       capture_output=not verbose)
    global _lib
    if r.returncode == 0:
        _lib = _load_lib()
    return _lib is not None


class NativePrefetcher:
    """Submit-ahead batch reader. Usage:

        pf = NativePrefetcher(n_threads=8)
        job = pf.submit(paths)         # returns immediately
        arrays = pf.fetch(job)         # blocks until all files are read
    """

    def __init__(self, n_threads=8):
        if _lib is None:
            raise RuntimeError("native loader not built; run "
                               "`make -C native` or use numpy fallback")
        self._pool = _lib.ctts_pool_create(n_threads)
        self._sizes = {}

    def __del__(self):
        if getattr(self, "_pool", None) and _lib is not None:
            _lib.ctts_pool_destroy(self._pool)
            self._pool = None

    def submit(self, paths):
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        job = _lib.ctts_submit(self._pool, arr, len(paths))
        if job < 0:
            raise RuntimeError("submit failed")
        self._sizes[job] = len(paths)
        return job

    def ready(self, job):
        return _lib.ctts_job_ready(self._pool, job) == 1

    def fetch(self, job):
        n = self._sizes.pop(job)
        out = []
        shape = (ctypes.c_long * 8)()
        ndim = ctypes.c_int()
        dtype = ctypes.c_int()
        for i in range(n):
            rc = _lib.ctts_array_info(self._pool, job, i, shape,
                                      ctypes.byref(ndim),
                                      ctypes.byref(dtype))
            if rc != 0:
                out.append(None)
                continue
            shp = tuple(shape[j] for j in range(ndim.value))
            a = np.empty(shp, _DTYPES[dtype.value])
            nbytes = int(np.prod(shp, dtype=np.int64)) * _ITEM[dtype.value]
            got = _lib.ctts_array_copy(
                self._pool, job, i, a.ctypes.data_as(ctypes.c_void_p),
                nbytes)
            out.append(a if got == nbytes else None)
        _lib.ctts_job_free(self._pool, job)
        return out


def read_batch(paths, n_threads=8):
    """One-shot convenience: read many .npy files concurrently."""
    if _lib is None:
        return [np.load(p) for p in paths]
    pf = NativePrefetcher(n_threads)
    return pf.fetch(pf.submit(paths))
