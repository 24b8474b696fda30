"""FASTQ ingest through the native C++ reader, with Python fallback."""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from allpathslg_tpu.io import fasta as pio
from allpathslg_tpu.native import build as nbuild


def read_fastq_arrays(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(codes [N, Lmax] uint8, quals [N, Lmax] uint8, lengths [N] int32).

    Uses the native reader for plain files; gzip or missing toolchain falls
    back to the pure-Python parser."""
    if not str(path).endswith(".gz"):
        lib = nbuild.fastq_lib()
        if lib is not None:
            n = ctypes.c_long()
            ml = ctypes.c_long()
            rc = lib.fastq_scan(path.encode(), ctypes.byref(n),
                                ctypes.byref(ml))
            if rc == 0 and n.value > 0:
                N, L = n.value, max(ml.value, 1)
                codes = np.empty((N, L), np.uint8)
                quals = np.empty((N, L), np.uint8)
                lengths = np.empty(N, np.int32)
                rc = lib.fastq_load(
                    path.encode(),
                    codes.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                    quals.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                    lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                    N, L)
                if rc == 0:
                    return codes, quals, lengths

    seqs, qs = pio.read_fastq(path)
    N = len(seqs)
    L = max((len(s) for s in seqs), default=1)
    codes = np.full((N, L), 4, np.uint8)
    quals = np.zeros((N, L), np.uint8)
    lengths = np.zeros(N, np.int32)
    for i, (s, q) in enumerate(zip(seqs, qs)):
        codes[i, : len(s)] = s
        quals[i, : len(q)] = q
        lengths[i] = len(s)
    return codes, quals, lengths
