"""Unit tests for the packed multi-word kmer bit library vs numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from allpathslg_tpu.kmer import bits

KS = [5, 16, 17, 24, 25, 31, 32, 48, 96]


def _rand_kmers(K, n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4, size=(n, K)).astype(np.uint8)


def _to_words(codes, K):
    """[n, K] codes -> list of W jnp arrays [n]."""
    W = bits.n_words(K)
    packed = np.zeros((len(codes), W), dtype=np.uint32)
    for i, row in enumerate(codes):
        packed[i] = bits.np_pack(row, K)
    return [jnp.asarray(packed[:, w]) for w in range(W)]


@pytest.mark.parametrize("K", KS)
def test_pack_roundtrip(K):
    codes = _rand_kmers(K, 20)
    for row in codes:
        words = bits.np_pack(row, K)
        assert (bits.np_unpack(words, K) == row).all()
        # pad bits are zero
        assert words[-1] & ~bits.last_word_mask(K) == 0


@pytest.mark.parametrize("K", KS)
def test_rc_matches_oracle(K):
    codes = _rand_kmers(K, 50)
    words = _to_words(codes, K)
    rc = bits.rc_words(words, K)
    rc_np = np.stack([np.asarray(w) for w in rc], axis=1)
    for i, row in enumerate(codes):
        assert tuple(rc_np[i]) == bits.np_rc(bits.np_pack(row, K), K), f"row {i}"


@pytest.mark.parametrize("K", KS)
def test_rc_involution(K):
    codes = _rand_kmers(K, 50, seed=3)
    words = _to_words(codes, K)
    back = bits.rc_words(bits.rc_words(words, K), K)
    for w1, w2 in zip(words, back):
        assert (np.asarray(w1) == np.asarray(w2)).all()


@pytest.mark.parametrize("K", KS)
def test_canonical(K):
    codes = _rand_kmers(K, 50, seed=4)
    words = _to_words(codes, K)
    canon, is_rc = bits.canonical(words, K)
    canon_np = np.stack([np.asarray(w) for w in canon], axis=1)
    for i, row in enumerate(codes):
        assert tuple(canon_np[i]) == bits.np_canonical(bits.np_pack(row, K), K)


@pytest.mark.parametrize("K", KS)
def test_get_base_and_shift(K):
    codes = _rand_kmers(K, 30, seed=5)
    words = _to_words(codes, K)
    for j in [0, 1, K // 2, K - 1]:
        b = np.asarray(bits.get_base(words, j))
        assert (b == codes[:, j]).all()
    # successor: shift_append(b) == codes[1:] + [b]
    newb = np.asarray([2] * len(codes), dtype=np.uint8)
    succ = bits.shift_append(words, jnp.asarray(newb), K)
    succ_np = np.stack([np.asarray(w) for w in succ], axis=1)
    for i, row in enumerate(codes):
        want = bits.np_pack(np.concatenate([row[1:], [2]]), K)
        assert tuple(succ_np[i]) == want
    # predecessor
    pred = bits.shift_prepend(words, jnp.asarray(newb), K)
    pred_np = np.stack([np.asarray(w) for w in pred], axis=1)
    for i, row in enumerate(codes):
        want = bits.np_pack(np.concatenate([[2], row[:-1]]), K)
        assert tuple(pred_np[i]) == want


def test_lex_less_matches_tuple_order():
    K = 33
    codes = _rand_kmers(K, 40, seed=6)
    words = _to_words(codes, K)
    a = [w[:20] for w in words]
    b = [w[20:] for w in words]
    lt = np.asarray(bits.lex_less(a, b))
    for i in range(20):
        ta = bits.np_pack(codes[i], K)
        tb = bits.np_pack(codes[20 + i], K)
        assert lt[i] == (ta < tb)


def test_sentinel_after_canonical_keys():
    for K in [16, 24, 96]:
        codes = np.full((1, K), 3, dtype=np.uint8)  # poly-T
        words = _to_words(codes, K)
        canon, _ = bits.canonical(words, K)
        sent = bits.sentinel_words(K, (1,))
        assert bool(np.asarray(bits.lex_less(canon, sent))[0])
