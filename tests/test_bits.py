import numpy as np
import jax.numpy as jnp

from lanczosplusplus_tpu.core import bits
from lanczosplusplus_tpu.core.combinatorics import (
    binomial_table, enumerate_combinations, rank_combinations,
    unrank_combinations, compositions)


def test_popcount_matches_python():
    rng = np.random.default_rng(0)
    w = rng.integers(0, 2**63, size=1000, dtype=np.uint64)
    expect = np.array([bin(int(x)).count("1") for x in w])
    np.testing.assert_array_equal(bits.popcount(w), expect)


def test_parity_sign_below():
    # word 0b1011: below site 2 there are 2 occupied -> +1;
    # below site 1 there is 1 occupied -> -1
    w = np.array([0b1011], dtype=np.uint64)
    assert bits.parity_sign_below(w, 2)[0] == 1
    assert bits.parity_sign_below(w, 1)[0] == -1
    assert bits.parity_sign_below(w, 0)[0] == 1


def test_pair_hop_sign_reference_convention():
    # doSign(ket, i, j) counts occupied in (i, j) plus occupation at i
    # (reference BasisOneSpin.h:104-121)
    def ref_dosign(ket, i, j):
        i, j = min(i, j), max(i, j)
        cnt = sum((ket >> b) & 1 for b in range(i + 1, j))
        cnt += (ket >> i) & 1
        return -1 if cnt & 1 else 1

    rng = np.random.default_rng(1)
    for _ in range(200):
        ket = int(rng.integers(0, 2**16))
        i, j = sorted(rng.choice(16, size=2, replace=False))
        got = bits.pair_hop_sign(np.array([ket], dtype=np.uint64), i, j)[0]
        assert got == ref_dosign(ket, i, j)


def test_enumeration_matches_reference_next_permutation():
    # reproduce the reference's bit-trick loop and compare orders
    def ref_enumerate(nsite, npart):
        if npart == 0:
            return [0]
        out = []
        ket = (1 << npart) - 1
        dim = 1
        n, m = nsite, 1
        while m <= npart:
            dim = dim * n // m
            n -= 1
            m += 1
        for _ in range(dim):
            out.append(ket)
            n = m = 0
            while (ket & 3) != 1:
                m += ket & 1
                n += 1
                ket >>= 1
            ket = ((ket + 1) << n) ^ ((1 << m) - 1)
        return out

    for nsite, npart in [(4, 2), (6, 3), (8, 1), (8, 7), (10, 5), (5, 0)]:
        got = enumerate_combinations(nsite, npart)
        assert list(got.astype(int)) == ref_enumerate(nsite, npart)


def test_rank_unrank_roundtrip():
    for nsite, npart in [(4, 2), (12, 6), (16, 3)]:
        words = enumerate_combinations(nsite, npart)
        ranks = rank_combinations(words, nsite)
        np.testing.assert_array_equal(ranks, np.arange(len(words)))
        back = unrank_combinations(ranks, nsite, npart)
        np.testing.assert_array_equal(back, words)


def test_binomial():
    t = binomial_table(20)
    assert t[20, 10] == 184756
    assert t[6, 0] == 1 and t[6, 6] == 1 and t[6, 2] == 15


def test_compositions():
    c = compositions(3, 2)
    assert c.shape == (4, 2)
    assert (c.sum(axis=1) == 3).all()


def test_jnp_popcount_matches():
    rng = np.random.default_rng(3)
    w = rng.integers(0, 2**31, size=256, dtype=np.uint32)
    got = np.asarray(bits.jnp_popcount(jnp.asarray(w)))
    np.testing.assert_array_equal(got, bits.popcount(w.astype(np.uint64)))
