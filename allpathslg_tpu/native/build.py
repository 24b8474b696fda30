"""Build + load the native host extensions (C++ via ctypes).

No pybind11 in this environment; the C ABI + ctypes keeps the toolchain to
a bare `g++ -O3 -shared -fPIC`. Libraries build lazily into the package
directory on first use and are cached; absence of a compiler degrades to
the pure-Python fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def _build(name: str) -> Optional[str]:
    src = os.path.join(_DIR, name + ".cpp")
    so = os.path.join(_DIR, name + ".so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o",
             so + ".tmp"],
            check=True, capture_output=True)
        os.replace(so + ".tmp", so)
        return so
    except Exception:
        return None


def load(name: str) -> Optional[ctypes.CDLL]:
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so = _build(name)
        lib = ctypes.CDLL(so) if so else None
        _LIBS[name] = lib
        return lib


def fastq_lib() -> Optional[ctypes.CDLL]:
    lib = load("fastq_reader")
    if lib is None:
        return None
    lib.fastq_scan.restype = ctypes.c_int
    lib.fastq_scan.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_long),
                               ctypes.POINTER(ctypes.c_long)]
    lib.fastq_load.restype = ctypes.c_int
    lib.fastq_load.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_ubyte),
                               ctypes.POINTER(ctypes.c_ubyte),
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.c_long, ctypes.c_long]
    return lib
