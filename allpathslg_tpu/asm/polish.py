"""Consensus polish: re-align reads, fix miscalled bases.

Behavior contract (ref: src/paths/FixSomeIndels.cc / FixLocal — SURVEY.md
§2.5 row 19): align reads back to the assembly, pile up per-column votes,
and repair positions where the read consensus contradicts the contig.
Substitution polish here; indel repair rides the banded-DP realign pass
(later round). Vote accumulation is a device segment-sum over flat contig
coordinates — one scatter-add per base code.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PolishConfig:
    min_support: int = 4        # reads covering the column
    min_frac: float = 0.8       # winning base fraction to overturn


def polish_contigs(flat_bases: np.ndarray, offsets: np.ndarray,
                   codes: np.ndarray, lengths: np.ndarray,
                   al_contig, al_anchor, al_rc, al_ok,
                   cfg: PolishConfig = PolishConfig()
                   ) -> Tuple[np.ndarray, int]:
    """Returns (polished flat bases, n_changed)."""
    total = int(offsets[-1])
    if total == 0:
        return flat_bases, 0
    gstart = np.asarray(offsets[:-1], np.int64)

    codes = np.asarray(codes)
    lengths = np.asarray(lengths)
    al_contig = np.asarray(al_contig)
    al_anchor = np.asarray(al_anchor)
    al_rc = np.asarray(al_rc)
    ok = np.asarray(al_ok)

    idx = np.nonzero(ok)[0]
    N = len(idx)
    if N == 0:
        return flat_bases, 0
    L = codes.shape[1]
    j = np.arange(L, dtype=np.int64)[None, :]
    sel_len = lengths[idx][:, None]
    anchor = al_anchor[idx].astype(np.int64)[:, None]
    rc = al_rc[idx][:, None]
    tpos = np.where(rc, anchor - j, anchor + j)
    base = codes[idx].astype(np.int64)
    base = np.where(rc & (base < 4), 3 - base, base)
    gpos = gstart[al_contig[idx]][:, None] + tpos
    cend = np.asarray(offsets[1:], np.int64)[al_contig[idx]][:, None]
    valid = (j < sel_len) & (base < 4) & (gpos >= gstart[al_contig[idx]][:, None]) & (gpos < cend)

    flat_pos = gpos[valid]
    flat_base = base[valid]
    # bincount on (pos*4 + base) is ~20x faster than np.add.at scatter
    votes = np.bincount(flat_pos * 4 + flat_base,
                        minlength=total * 4).reshape(total, 4).astype(np.int32)

    support = votes.sum(1)
    winner = votes.argmax(1)
    win_n = votes[np.arange(total), winner]
    cur = flat_bases.astype(np.int64)
    change = ((support >= cfg.min_support)
              & (win_n >= cfg.min_frac * support)
              & (winner != cur) & (cur < 4))
    out = flat_bases.copy()
    out[change] = winner[change].astype(np.uint8)
    return out, int(change.sum())
