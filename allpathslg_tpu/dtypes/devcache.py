"""Device-resident packed read-batch cache.

The axon tunnel's host->device upload bandwidth is ~0.5-3 MB/s (measured
r4, docs/scaling.md) while HBM holds 16 GB: re-uploading the read set per
streamed pass — the r3 design — costs an hour per EC stage at genome
scale. This cache uploads each read batch ONCE (2-bit packed codes +
N-mask + 4-bit palette quals, dtypes/packed layout) and keeps it in HBM;
correction stages REPLACE the resident code words in place (their packed
outputs never leave the device) and only the final artifact save
downloads (the download direction is ~20x faster).

The reference's analog is MasterVec keeping the read set resident in RAM
across FindErrors phases (ref: src/feudal/MasterVec.h; SURVEY.md §2.1) —
here "resident" means HBM, and the link is the scarce resource.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from allpathslg_tpu.dtypes import packed as pk


class DeviceBatches:
    """Fixed-size packed read batches resident on device.

    words[i]/nmask[i]: device uint32 arrays (2-bit codes + N mask).
    qnib[i]/qpal[i]: packed quals (or None when quals are absent).
    The last batch is padded with all-N reads to the fixed batch size.
    """

    def __init__(self, batch_size: int, L: int, n_real: int):
        self.batch = batch_size
        self.L = L
        self.n_real = n_real
        self.words: List = []
        self.nmask: List = []
        self.qnib: List = []
        self.qpal: List = []
        self.lengths: List = []      # device int32 [batch] (or empty)

    @property
    def n_batches(self) -> int:
        return len(self.words)

    @classmethod
    def from_host(cls, codes: np.ndarray, quals: Optional[np.ndarray],
                  batch_size: int,
                  lengths: Optional[np.ndarray] = None) -> "DeviceBatches":
        import jax.numpy as jnp

        n, L = codes.shape
        db = cls(batch_size, L, n)
        # one palette for the whole read set: per-batch palettes could
        # differ and would force recompiles (ADVICE r3)
        if quals is not None:
            palette = np.unique(np.asarray(quals))
            if len(palette) > 16:
                palette = None
        for s in range(0, n, batch_size):
            e = min(s + batch_size, n)
            cb = np.asarray(codes[s:e])
            if e - s < batch_size:
                cb = np.concatenate(
                    [cb, np.full((batch_size - (e - s), L), 4, cb.dtype)])
            w, m, _ = pk.pack_codes(cb)
            db.words.append(jnp.asarray(w))
            db.nmask.append(jnp.asarray(m))
            if quals is None:
                db.qnib.append(None)
                db.qpal.append(None)
            else:
                qb = np.asarray(quals[s:e])
                if e - s < batch_size:
                    qb = np.concatenate(
                        [qb, np.zeros((batch_size - (e - s), L), qb.dtype)])
                if palette is None:
                    db.qnib.append(None)
                    db.qpal.append(jnp.asarray(qb))
                else:
                    qn, qp, _ = pk.pack_quals(qb)
                    db.qnib.append(jnp.asarray(qn))
                    db.qpal.append(jnp.asarray(qp))
            if lengths is not None:
                lb = np.asarray(lengths[s:e]).astype(np.int32)
                if e - s < batch_size:
                    lb = np.concatenate(
                        [lb, np.zeros(batch_size - (e - s), np.int32)])
                db.lengths.append(jnp.asarray(lb))
        return db

    def update_codes(self, i: int, words, nmask) -> None:
        """Replace batch i's resident code words (device handles)."""
        self.words[i] = words
        self.nmask[i] = nmask

    def codes_to_host(self) -> np.ndarray:
        """Download + unpack all batches -> [n_real, L] uint8 codes."""
        self.n_host_downloads = getattr(self, "n_host_downloads", 0) + 1
        outs = []
        for w, m in zip(self.words, self.nmask):
            outs.append(pk.unpack_codes_host(np.asarray(w), np.asarray(m),
                                             self.L))
        return np.concatenate(outs)[: self.n_real]
