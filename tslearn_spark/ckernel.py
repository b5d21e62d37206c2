"""Optional compiled DTW kernel (guide §4.2: native code inside the
Arrow boundary).

Compiles ``_dtw_kernel.c`` with the system C compiler into a per-machine
cache (`$TMPDIR/tslearn_spark_ck/dtw_<srchash>.so`) the first time it is
needed and loads it via ctypes.  Spark local-mode python workers share
the cache with the driver (the driver's import builds it before workers
spawn); at cluster scale each executor machine builds its own copy once.

Everything is best-effort: no compiler, a failed compile, or
``TSLEARN_SPARK_CKERNEL=0`` silently leaves ``lib_or_none()`` returning
None and the numpy kernels run unchanged.  The compiled DP is
bit-identical to the numpy kernel on non-abandoned pairs (see the .c
header; pinned by tests/test_ckernel.py), so which path executed is
unobservable in results.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_dtw_kernel.c")
_CC = os.environ.get("TSLEARN_SPARK_CC", "gcc")
# -ffp-contract=off: FMA contraction would re-round (a-b)*(a-b)+acc and
# break bit-identity with the numpy kernel; everything else is plain
# IEEE double arithmetic on both sides.
_CFLAGS = ["-O2", "-ffp-contract=off", "-shared", "-fPIC"]

_lock = threading.Lock()
_lib = None
_tried = False

_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_F64P = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get("TSLEARN_SPARK_CK_DIR") or os.path.join(
        tempfile.gettempdir(), "tslearn_spark_ck")
    return os.path.join(cache, f"dtw_{h}.so")


def lib_or_none():
    """The loaded kernel library, or None when unavailable/disabled."""
    global _lib, _tried
    if _tried:
        return _lib
    with _lock:
        if _tried:
            return _lib
        lib = None
        if os.environ.get("TSLEARN_SPARK_CKERNEL", "1") != "0":
            try:
                so = _so_path()
                if not os.path.exists(so):
                    os.makedirs(os.path.dirname(so), exist_ok=True)
                    # unique tmp + atomic rename: concurrent builders
                    # (32 local workers on a cold cache) cannot corrupt
                    # the file another process is dlopening
                    tmp = f"{so}.tmp.{os.getpid()}"
                    subprocess.run(
                        [_CC, *_CFLAGS, "-o", tmp, _SRC, "-lm"],
                        check=True, capture_output=True, timeout=120)
                    os.replace(tmp, so)
                cand = ctypes.CDLL(so)
                cand.dtw_batch.restype = None
                cand.dtw_batch.argtypes = [
                    _F64P, _I64P, _I64P,        # bufA, offA, lenA
                    _F64P, _I64P, _I64P,        # bufB, offB, lenB
                    ctypes.c_longlong,          # n
                    ctypes.c_longlong,          # d
                    ctypes.c_longlong,          # radius (<0: none)
                    ctypes.c_void_p,            # tau2 (NULL: none)
                    _F64P,                      # out
                ]
                lib = cand
            except Exception:
                lib = None
        _lib = lib
        _tried = True
        return _lib


def _flatten(arrs: list, d: int):
    n = len(arrs)
    lens = np.fromiter((a.shape[0] for a in arrs), dtype=np.int64, count=n)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1] * d, out=offs[1:])
    buf = np.concatenate(
        [np.ascontiguousarray(a, dtype=np.float64).reshape(-1) for a in arrs]
    ) if n else np.empty(0)
    return buf, offs, lens


def dtw_batch(arrs_a: list, arrs_b: list, radius, tau2=None) -> np.ndarray:
    """Run the compiled DP over a mixed-shape pair batch.

    Caller guarantees lib_or_none() is not None.  Returns the same
    doubles as the numpy kernels (bitwise, modulo the documented tau2
    inf-vs-above-cap freedom).
    """
    lib = lib_or_none()
    n = len(arrs_a)
    d = arrs_a[0].shape[1] if arrs_a[0].ndim > 1 else 1
    buf_a, off_a, len_a = _flatten(arrs_a, d)
    buf_b, off_b, len_b = _flatten(arrs_b, d)
    out = np.empty(n, dtype=np.float64)
    if tau2 is None:
        tau_p = None
    else:
        tau_arr = np.ascontiguousarray(tau2, dtype=np.float64)
        tau_p = tau_arr.ctypes.data_as(ctypes.c_void_p)
    lib.dtw_batch(buf_a, off_a, len_a, buf_b, off_b, len_b,
                  n, d, -1 if radius is None else int(radius), tau_p, out)
    if n and out[0] == -1.0 and np.all(out == -1.0):
        raise MemoryError("dtw_batch scratch allocation failed")
    return out
