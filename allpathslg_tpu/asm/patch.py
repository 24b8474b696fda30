"""Gap patching: close scaffold gaps with read evidence.

Behavior contract (ref: src/paths/PostPatcher.cc + UnipathPatcher/
PatcherCottage — SURVEY.md §2.5 row 15): for each scaffold junction, recruit
reads hanging off the two contig ends, build the crossing sequence, validate
it, and stitch accepted patches so contigs merge (raising contig N50 toward
scaffold N50). The reference forks per-gap child processes for isolation;
here gaps are data in a batch: pileup extension matrices are built per
junction, and acceptance is the banded-DP device kernel comparing the
extension against the far contig's flank.

Negative gaps (overlapping contig ends the scaffolder inferred) are closed
by direct banded alignment of the flanks.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from allpathslg_tpu.ops import banded
from allpathslg_tpu.scaffold.superb import Superb


@dataclasses.dataclass(frozen=True)
class PatchConfig:
    min_cov: int = 2            # pileup support to call an extension base
    max_ext: int = 600          # longest extension attempted per side
    flank: int = 400            # recruit reads ending this close to the gap
    band: int = 12
    max_cost_frac: float = 0.05  # DP cost vs overlap length to accept
    min_anchor: int = 24        # extension must reach this far into c2


def _rc(seq: np.ndarray) -> np.ndarray:
    out = (3 - seq[::-1].astype(np.int32)) % 4
    out = np.where(seq[::-1] > 3, 4, out)
    return out.astype(np.uint8)


def _oriented(contig: np.ndarray, flip: bool) -> np.ndarray:
    return _rc(contig) if flip else contig


def _pileup_extension(ext_rows: List[np.ndarray], cfg: PatchConfig) -> np.ndarray:
    """Column-majority consensus of read suffixes hanging past a contig end.
    Stops at the first column with support < min_cov or a contested vote."""
    if not ext_rows:
        return np.zeros(0, np.uint8)
    L = max(len(r) for r in ext_rows)
    M = np.full((len(ext_rows), L), 4, np.uint8)
    for i, r in enumerate(ext_rows):
        M[i, : len(r)] = r
    out = []
    for col in range(L):
        c = M[:, col]
        c = c[c < 4]
        if len(c) < cfg.min_cov:
            break
        counts = np.bincount(c, minlength=4)
        b = int(counts.argmax())
        if counts[b] < 0.7 * len(c):
            break
        out.append(b)
    return np.asarray(out, np.uint8)


def _hanging_suffixes(contig_id, contig_len, flip, codes, lengths,
                      al_contig, al_anchor, al_rc, al_ok, cfg: PatchConfig):
    """Read suffixes extending past the oriented contig's trailing end.

    With flip=False we want reads crossing the contig's RIGHT end (fwd reads
    near the end); with flip=True, reads crossing its LEFT end, returned in
    the scaffold's (flipped) orientation.
    """
    rows = []
    idx = np.nonzero(al_ok & (al_contig == contig_id))[0]
    for i in idx:
        rc = bool(al_rc[i])
        L = int(lengths[i])
        if L == 0:
            continue
        a = int(al_anchor[i])
        start = a if not rc else a - (L - 1)
        end = start + L
        if not flip:
            # crossing the right end: end > contig_len
            over = end - contig_len
            if over <= 0 or contig_len - start > cfg.flank + L:
                continue
            if start >= contig_len:
                continue
            read = codes[i, :L]
            seq = read if not rc else _rc(read)
            rows.append(seq[L - over:])
        else:
            # crossing the left end (start < 0), flipped orientation
            over = -start
            if over <= 0 or end < -cfg.flank:
                continue
            if end <= 0:
                continue
            read = codes[i, :L]
            seq = read if not rc else _rc(read)
            rows.append(_rc(seq[:over]))
    rows = [r[: cfg.max_ext] for r in rows if len(r) > 0]
    return rows


def patch_scaffold_gaps(scaffolds: List[Superb], contigs: List[np.ndarray],
                        codes: np.ndarray, lengths: np.ndarray,
                        al_contig, al_anchor, al_rc, al_ok,
                        cfg: PatchConfig = PatchConfig()):
    """Attempt to close every junction of every scaffold.

    Returns (new_contigs, new_scaffolds, n_closed). Closed junctions merge
    their two contigs into one (appended to the contig list; originals are
    dropped from scaffolds)."""
    contigs = list(contigs)
    new_scaffolds: List[Superb] = []
    n_closed = 0

    for sb in scaffolds:
        ids = list(sb.contig_ids)
        rc = list(sb.rc)
        gaps = list(sb.gaps)
        devs = list(sb.gap_devs)
        j = 0
        while j < len(gaps):
            c1, f1 = ids[j], rc[j]
            c2, f2 = ids[j + 1], rc[j + 1]
            g, dev = gaps[j], devs[j]
            s1 = _oriented(np.asarray(contigs[c1]), f1)
            s2 = _oriented(np.asarray(contigs[c2]), f2)
            merged = _try_close(s1, s2, g, dev, c1, c2, f1, f2,
                                codes, lengths, al_contig, al_anchor,
                                al_rc, al_ok, contigs, cfg)
            if merged is not None:
                contigs.append(merged)
                nid = len(contigs) - 1
                ids[j : j + 2] = [nid]
                rc[j : j + 2] = [False]
                del gaps[j]
                del devs[j]
                n_closed += 1
            else:
                j += 1
        new_scaffolds.append(Superb(ids, rc, gaps, devs))
    return contigs, new_scaffolds, n_closed


def _try_close(s1, s2, g, dev, c1, c2, f1, f2, codes, lengths,
               al_contig, al_anchor, al_rc, al_ok, contigs, cfg: PatchConfig):
    # near-touching / overlapping ends: direct flank alignment.
    # Use a conservative anchor: the first A bases of s2, with A small
    # enough to surely lie inside s1's tail (A <= likely_overlap), and a
    # band wide enough to absorb the gap-estimate error.
    if g < 0:
        slack = 3 * max(dev, 4)
        A = int(max(-g - slack, cfg.min_anchor))
        A = min(A, len(s2), cfg.max_ext)
        T = min(len(s1), -g + slack + A + cfg.band)
        band = _round_band(max(cfg.band, slack + 4))
        if A >= 8 and T > A:
            q = s2[:A]
            t = s1[len(s1) - T:]
            off = T + g  # expected column where q starts inside t
            cost, tend = _dp(q, t, off, cfg, band=band)
            if (cost is not None and tend is not None
                    and cost <= max(2, cfg.max_cost_frac * A)
                    and tend <= len(t)):
                cut = len(s1) - T + tend
                return np.concatenate([s1[:cut], s2[A:]])
        return None

    # positive gap: pileup extension from c1's trailing end
    ext = _pileup_extension(
        _hanging_suffixes(c1, len(contigs[c1]), f1, codes, lengths,
                          al_contig, al_anchor, al_rc, al_ok, cfg), cfg)
    need = g + cfg.min_anchor
    if len(ext) >= need:
        # verify the extension lands on s2's start
        anchor = ext[g : g + cfg.min_anchor + 3 * max(dev, 4)]
        # search s2 prefix for the anchor allowing gap misestimate ±3dev
        q = anchor[: cfg.min_anchor]
        t = s2[: cfg.min_anchor + 6 * max(dev, 4) + 2 * cfg.band]
        best = None
        for shift in range(-3 * max(dev, 4), 3 * max(dev, 4) + 1):
            gg = g + shift
            if gg < 0 or gg + cfg.min_anchor > len(ext):
                continue
            a = ext[gg : gg + cfg.min_anchor]
            cost, _ = _dp(a, t, 0, cfg)
            if cost is not None and (best is None or cost < best[0]):
                best = (cost, gg)
        if best is not None and best[0] <= max(1, cfg.max_cost_frac * cfg.min_anchor):
            gg = best[1]
            return np.concatenate([s1, ext[:gg], s2])
    return None


def _round_band(b: int) -> int:
    """Quantize band widths to bound jit recompiles."""
    for cand in (12, 24, 48, 96, 192):
        if b <= cand:
            return cand
    return 192


def _dp(q: np.ndarray, t: np.ndarray, off: int, cfg: PatchConfig,
        band: int = 0):
    if len(q) == 0 or len(t) == 0:
        return None, None
    qj = jnp.asarray(q[None, :])
    tj = jnp.asarray(t[None, :])
    cost, tend = banded.banded_align(
        qj, jnp.asarray([len(q)], jnp.int32), tj,
        jnp.asarray([len(t)], jnp.int32),
        jnp.asarray([off], jnp.int32), band=band or cfg.band)
    c = int(cost[0])
    if c >= (1 << 20):
        return None, None
    return c, int(tend[0])
