"""Numpy prototype of the bit-parallel (Myers/Hyyro-style) banded edit DP.

Validates the delta-encoded formulation against ops.banded.np_banded_oracle
before committing it to a Pallas kernel.

Formulation (slot coords k = j - i - off + band, K = 2*band+1 <= 32):
  row values v[k]; deltas Delta[k] = v[k] - v[k-1] in {-1,0,+1} as P/M bits
  (bits 1..K-1; bit 0 unused); s0 = v[0].
  Row advance: X = Eq | (M >> 1)
               c = carries of X + (X|P)  (c[k] == Z[k-1])
               Z = X | (P & c)           (Z[k]: new-minus-old diag delta == 0)
               P' = (P & ~(c^Z)) | (~P & ~M & c & ~Z)
               M' = (M & ~(c^Z)) | (~P & ~M & ~c & Z)
               s0' = s0 + 1 - (Z & 1)
  Init row 0: v0[k] = |off - band + k| (virtual never-match target extension
  makes the j<=0 and j>tlen regions self-consistent; valid cells never
  depend on invalid ones).
"""
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from allpathslg_tpu.ops.banded import np_banded_oracle  # noqa: E402

M32 = 0xFFFFFFFF


def myers_banded_np(q, t, off, band):
    K = 2 * band + 1
    assert K <= 32
    Lq, Lt = len(q), len(t)
    bandmask = ((1 << K) - 1) & ~1  # bits 1..K-1

    # init row 0: glocal — D[0][j] = 0 on every slot (virtual never-match
    # target extension makes j<0 columns equal i and j>Lt cells harmless)
    P = 0
    Mb = 0
    s0 = 0

    for i in range(1, Lq + 1):
        # Eq bit k: q[i-1] == t[j-1], j = i + off - band + k, only for real j
        Eq = 0
        for k in range(K):
            j = i + off - band + k
            if 1 <= j <= Lt and q[i - 1] == t[j - 1]:
                Eq |= 1 << k
        X = (Eq | (Mb >> 1)) & ((1 << K) - 1)
        V = (X | P) & M32
        S = (X + V) & M32
        c = (S ^ X ^ V) & M32        # c[k] = Z[k-1]
        Z = (X | (P & c)) & M32
        ncz = ~(c ^ Z) & M32
        pm = (~(P | Mb)) & M32
        Pn = ((P & ncz) | (pm & c & ~Z)) & bandmask
        Mn = ((Mb & ncz) | (pm & ~c & Z)) & bandmask
        s0 = s0 + 1 - (Z & 1)
        P, Mb = Pn, Mn

    # extract values
    v = np.empty(K, np.int64)
    v[0] = s0
    for k in range(1, K):
        v[k] = v[k - 1] + ((P >> k) & 1) - ((Mb >> k) & 1)
    # valid final cells: j = Lq + off - band + k in [0, Lt]
    best, bk = None, -1
    for k in range(K):
        j = Lq + off - band + k
        if 0 <= j <= Lt:
            if best is None or v[k] < best:
                best, bk = v[k], k
    if best is None:
        return 1 << 20, -1
    return int(best), Lq + off - band + bk


def main():
    rng = np.random.default_rng(0)
    n_fail = 0
    for trial in range(3000):
        band = int(rng.integers(1, 16))
        Lq = int(rng.integers(1, 40))
        Lt = int(rng.integers(1, 50))
        q = rng.integers(0, 4, Lq).astype(np.uint8)
        if rng.random() < 0.5:
            # mutated copy => realistic near-diagonal problems
            t = q.copy()
            nmut = int(rng.integers(0, 4))
            for _ in range(nmut):
                p = int(rng.integers(0, len(t)))
                op = rng.random()
                if op < 0.4:
                    t[p] = rng.integers(0, 4)
                elif op < 0.7 and len(t) > 1:
                    t = np.delete(t, p)
                else:
                    t = np.insert(t, p, rng.integers(0, 4))
            t = t[:Lt] if len(t) > Lt else t
            if len(t) == 0:
                t = rng.integers(0, 4, 1).astype(np.uint8)
            Lt = len(t)
        else:
            t = rng.integers(0, 4, Lt).astype(np.uint8)
        off = int(rng.integers(-(Lq + band), Lt + band + 1))

        want_cost, want_tend = np_banded_oracle(q, t, off, band)
        got_cost, got_tend = myers_banded_np(q, t, off, band)
        ok = got_cost == want_cost
        # tie-breaks on tend may differ; compare cost strictly, tend only
        # when cost is feasible and oracle tend unique
        if not ok:
            n_fail += 1
            if n_fail <= 5:
                print(f"FAIL trial={trial} band={band} off={off} "
                      f"Lq={Lq} Lt={Lt} want={want_cost} got={got_cost}")
                print("  q:", q.tolist())
                print("  t:", t.tolist())
    print(f"{3000 - n_fail}/3000 cost matches")


if __name__ == "__main__":
    main()
