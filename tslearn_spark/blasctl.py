"""Worker-side BLAS thread cap.

numpy's bundled OpenBLAS defaults to one thread PER CORE in every
process that loads it.  Spark python workers are already
task-parallel — local[32] runs 32 workers — so the default explodes to
up to cores^2 BLAS threads (32 x 32 = 1024 here), and the resulting
oversubscription is the measured bimodal collapse of the GEMM stages:
the same brute-force cosine plan timed 0.83 s on a quiet scheduler and
8-20 s when the thread armies collided (r12, four clearCache'd passes
of one plan).  One BLAS thread per worker is exactly core count in
aggregate and is the standard setting for task-parallel numpy.

Environment variables cannot fix this reliably: OpenBLAS reads them at
library load, the workers inherit the executor JVM's environment, and
the driver harness owns a JVM this package never launched.  So the cap
is applied AT RUNTIME inside the worker, via the
``openblas_set_num_threads`` symbol of the already-loaded library
(located through /proc/self/maps).  Every GEMM-bearing generator calls
:func:`limit_blas_threads` once per process (cached, fail-safe no-op on
platforms without the symbol).

The DRIVER process is deliberately left uncapped — driver-side numpy
(the m x m Nystroem eigh, L-BFGS, SMO) is the only BLAS user in that
process and benefits from the full default.
"""

from __future__ import annotations

import ctypes
import re

_DONE: dict[int, bool] = {}


def limit_blas_threads(n: int = 1) -> bool:
    """Cap OpenBLAS threads for THIS process; True if a setter ran.
    Idempotent per (process, n); never raises."""
    if _DONE.get(n):
        return True
    try:
        libs = sorted({
            line.split()[-1]
            for line in open("/proc/self/maps")
            if re.search(r"openblas", line, re.IGNORECASE)
            and line.split()[-1].startswith("/")
        })
        for path in libs:
            lib = ctypes.CDLL(path)
            for sym, argtype in (("openblas_set_num_threads", ctypes.c_int),
                                 ("openblas_set_num_threads64_",
                                  ctypes.c_int64)):
                fn = getattr(lib, sym, None)
                if fn is not None:
                    # declare the argtype explicitly: the ILP64-suffixed
                    # symbol takes a 64-bit int, and ctypes' default C-int
                    # marshalling leaves the upper register bits
                    # unspecified on some ABIs
                    fn.argtypes = [argtype]
                    fn.restype = None
                    fn(argtype(int(n)))
                    _DONE[n] = True
                    return True
    except Exception:
        pass
    return False
