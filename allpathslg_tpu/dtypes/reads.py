"""Read batches and pair tables — the framework's core data types.

The reference's feudal layer (ref: src/feudal/BaseVec.h, src/Basevector.h,
src/Qualvector.h — `vecbasevector`/`vecqualvector`, 2-bit packed DNA with
4-bit quals in mmap-able pools) becomes dense device tensors:

  * `ReadBatch`: codes uint8 [N, Lmax] (0..3 = ACGT, 4 = N/pad) + lengths
    int32 [N] + optional quals uint8 [N, Lmax]. Positions >= length always
    hold the pad code so windowed kernels need no separate length check.
  * `PairTable`: int32 [P, 2] read indices + int8 library ids + per-library
    insert statistics (ref: src/PairsManager.h `.pairs` format).

Ragged collections (unibases, contigs) use flat+offsets CSR layout; see
`allpathslg_tpu.dtypes.ragged`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

PAD_CODE = 4
_CODE_OF = np.full(256, PAD_CODE, dtype=np.uint8)
for i, c in enumerate("ACGT"):
    _CODE_OF[ord(c)] = i
    _CODE_OF[ord(c.lower())] = i
_BASE_OF = np.array(list("ACGTN"), dtype="U1")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ReadBatch:
    """A fixed-shape batch of reads (device-friendly)."""

    codes: jax.Array    # uint8 [N, Lmax]; >= length positions hold PAD_CODE
    lengths: jax.Array  # int32 [N]
    quals: Optional[jax.Array] = None  # uint8 [N, Lmax], 0 where padded

    @property
    def n_reads(self) -> int:
        return self.codes.shape[0]

    @property
    def max_len(self) -> int:
        return self.codes.shape[1]

    def enforce_padding(self) -> "ReadBatch":
        pos = jnp.arange(self.max_len, dtype=jnp.int32)[None, :]
        mask = pos < self.lengths[:, None]
        codes = jnp.where(mask, self.codes, jnp.uint8(PAD_CODE))
        quals = None if self.quals is None else jnp.where(mask, self.quals, jnp.uint8(0))
        return ReadBatch(codes, self.lengths, quals)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PairTable:
    """Read pairing + library metadata (ref: src/PairsManager.h)."""

    pairs: jax.Array     # int32 [P, 2] — indices into the read batch
    lib_ids: jax.Array   # int8  [P]
    # per-library stats, indexed by lib id:
    lib_sep: jax.Array   # int32 [L] — nominal insert size (outer distance)
    lib_sd: jax.Array    # int32 [L] — its standard deviation

    @property
    def n_pairs(self) -> int:
        return self.pairs.shape[0]


# ---------------------------------------------------------------------------
# host-side constructors
# ---------------------------------------------------------------------------

def batch_from_strings(seqs: Sequence[str], quals: Optional[Sequence[np.ndarray]] = None,
                       max_len: Optional[int] = None) -> ReadBatch:
    n = len(seqs)
    lmax = max_len or max((len(s) for s in seqs), default=0)
    codes = np.full((n, lmax), PAD_CODE, dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    q = np.zeros((n, lmax), dtype=np.uint8) if quals is not None else None
    for i, s in enumerate(seqs):
        arr = _CODE_OF[np.frombuffer(s.encode(), dtype=np.uint8)]
        l = min(len(arr), lmax)
        codes[i, :l] = arr[:l]
        lengths[i] = l
        if q is not None:
            q[i, :l] = np.asarray(quals[i][:l], dtype=np.uint8)
    return ReadBatch(jnp.asarray(codes), jnp.asarray(lengths),
                     None if q is None else jnp.asarray(q))


def batch_from_codes(codes: np.ndarray, lengths: np.ndarray,
                     quals: Optional[np.ndarray] = None) -> ReadBatch:
    """Host-side constructor: pads in numpy (device transfer happens when a
    kernel first consumes the arrays — keeps multi-GB prep off the wire)."""
    codes = np.asarray(codes, dtype=np.uint8)
    lengths = np.asarray(lengths, dtype=np.int32)
    pos = np.arange(codes.shape[1], dtype=np.int32)[None, :]
    mask = pos < lengths[:, None]
    codes = np.where(mask, codes, np.uint8(PAD_CODE))
    q = None
    if quals is not None:
        q = np.where(mask, np.asarray(quals, dtype=np.uint8), np.uint8(0))
    return ReadBatch(codes, lengths, q)


def strings_from_batch(batch: ReadBatch) -> list:
    codes = np.asarray(batch.codes)
    lengths = np.asarray(batch.lengths)
    return ["".join(_BASE_OF[codes[i, : lengths[i]]]) for i in range(codes.shape[0])]


def codes_from_string(s: str) -> np.ndarray:
    return _CODE_OF[np.frombuffer(s.encode(), dtype=np.uint8)]


def string_from_codes(codes: np.ndarray) -> str:
    return "".join(_BASE_OF[np.clip(np.asarray(codes), 0, 4)])
