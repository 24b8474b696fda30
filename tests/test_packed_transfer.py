"""2-bit packed host->device code transfer (ref: feudal BaseVec layout)."""

import numpy as np
import jax
import jax.numpy as jnp

from allpathslg_tpu.dtypes import packed


def test_roundtrip_all_lengths():
    rng = np.random.default_rng(0)
    for L in (1, 15, 16, 17, 31, 32, 33, 100, 150):
        codes = rng.integers(0, 5, (7, L)).astype(np.uint8)
        w, m, L2 = packed.pack_codes(codes)
        assert L2 == L and w.shape == (7, (L + 15) // 16)
        out = np.asarray(jax.jit(
            packed.unpack_codes, static_argnums=2)(jnp.asarray(w),
                                                   jnp.asarray(m), L))
        np.testing.assert_array_equal(out, codes)


def test_transfer_bytes_shrink():
    """2 bits/base + always-full-width N mask = 2.67x fewer link bytes.

    The mask is emitted even for N-free batches so consecutive batches
    keep ONE pytree shape (no XLA recompiles of the big jitted
    consumers — ADVICE r3); that trades the old 4x best case for a
    constant 2.67x."""
    codes = np.zeros((1024, 128), np.uint8)
    w, m, _ = packed.pack_codes(codes)
    packed_bytes = w.nbytes + m.nbytes
    assert packed_bytes * 2.6 < codes.nbytes
    # shape stability: an N-bearing batch packs to the same shapes
    codes2 = codes.copy()
    codes2[0, 0] = 4
    w2, m2, _ = packed.pack_codes(codes2)
    assert w2.shape == w.shape and m2.shape == m.shape


def test_qual_palette_roundtrip():
    rng = np.random.default_rng(3)
    vals = np.array([2, 12, 23, 37], np.uint8)  # NovaSeq-style binning
    q = vals[rng.integers(0, 4, (9, 101))]
    nib, pal, L = packed.pack_quals(q)
    assert nib is not None and nib.nbytes * 1.9 < q.nbytes
    out = np.asarray(jax.jit(
        packed.unpack_quals, static_argnums=2)(jnp.asarray(nib),
                                               jnp.asarray(pal), L))
    np.testing.assert_array_equal(out, q)


def test_qual_raw_fallback():
    rng = np.random.default_rng(4)
    q = rng.integers(0, 42, (5, 80)).astype(np.uint8)  # 17+ distinct
    nib, pal, L = packed.pack_quals(q)
    assert nib is None
    out = np.asarray(packed.unpack_quals(nib, pal, L))
    np.testing.assert_array_equal(out, q)
