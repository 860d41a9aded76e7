"""Spin-orbital chain (reference SpinOrbital.cpp) oracles."""

import numpy as np
import pytest

from lanczosplusplus_tpu.models.spin_orbital import build_spin_orbital
from lanczosplusplus_tpu.solver import lanczos as lz


def _kron_oracle_half(nsites):
    """For J=1/2 the model is exactly sum_i (S_i.S_{i+1})(L_i.L_{i+1});
    independent dense build from Pauli matrices, site 0 = lowest digit
    = innermost kron factor."""
    sz = np.diag([-0.5, 0.5])
    sp = np.array([[0.0, 0.0], [1.0, 0.0]])  # raises digit 0 -> 1
    sm = sp.T

    def chain_op(op, i, n):
        mats = [np.eye(2)] * n
        mats[i] = op
        out = mats[0]
        for k in range(1, n):
            out = np.kron(mats[k], out)
        return out

    d = 2 ** nsites
    H = np.zeros((d * d, d * d))
    for i in range(nsites - 1):
        j = i + 1
        bond = np.zeros((d, d))
        bond += 0.5 * (chain_op(sp, i, nsites) @ chain_op(sm, j, nsites))
        bond += 0.5 * (chain_op(sm, i, nsites) @ chain_op(sp, j, nsites))
        bond += chain_op(sz, i, nsites) @ chain_op(sz, j, nsites)
        H += np.kron(bond, bond)  # L-sector outer (higher digits), S inner
    return H


def _reference_transcription(nsites, twice_j):
    """Slow per-state loop implementing SpinOrbital.cpp:70-127
    literally."""
    nper = twice_j + 1
    jv = 0.5 * twice_j
    states = nper ** nsites

    def digits(ind):
        v = []
        for _ in range(nsites):
            v.append(ind % nper)
            ind //= nper
        return v

    def pack(v):
        out = 0
        for i in reversed(range(nsites)):
            out = out * nper + v[i]
        return out

    def one_term(v, i, j, which):
        if which == 0:
            if v[i] == twice_j or v[j] == 0:
                return None
            val = 0.5 * (jv * (jv + 1) -
                         (v[i] - jv) * (v[i] - jv + 1))
            w = list(v)
            w[i] += 1
            w[j] -= 1
            return val, pack(w)
        if which == 1:
            if v[j] == twice_j or v[i] == 0:
                return None
            val = 0.5 * (jv * (jv + 1) -
                         (v[j] - jv) * (v[j] - jv + 1))
            w = list(v)
            w[i] -= 1
            w[j] += 1
            return val, pack(w)
        return (v[i] - jv) * (v[j] - jv), pack(v)

    total = states * states
    H = np.zeros((total, total))
    for idl in range(states):
        vl = digits(idl)
        for ids in range(states):
            vs = digits(ids)
            row = ids + idl * states
            for i in range(nsites - 1):
                for w0 in range(3):
                    ts = one_term(vs, i, i + 1, w0)
                    if ts is None:
                        continue
                    for w1 in range(3):
                        tl = one_term(vl, i, i + 1, w1)
                        if tl is None:
                            continue
                        H[row, ts[1] + tl[1] * states] += ts[0] * tl[0]
    return H


@pytest.mark.parametrize("nsites,twice_j", [(2, 1), (3, 1), (2, 2),
                                            (3, 2)])
def test_matches_reference_transcription(nsites, twice_j):
    ham = build_spin_orbital(nsites, twice_j)
    dense = ham.to_dense()
    oracle = _reference_transcription(nsites, twice_j)
    np.testing.assert_allclose(dense, oracle, atol=1e-12)
    assert np.abs(dense - dense.T).max() < 1e-12


def test_twice_j_three_is_nonhermitian_like_reference():
    """The reference's amplitude recipe (0.5*(J(J+1)-m(m+1)) without the
    sqrt pairing) is only Hermitian for J <= 1; for twiceJ=3 its own
    isHermitian() throws.  We reproduce the matrix faithfully, so the
    same asymmetry must appear."""
    ham = build_spin_orbital(2, 3)
    dense = ham.to_dense()
    np.testing.assert_allclose(dense, _reference_transcription(2, 3),
                               atol=1e-12)
    assert np.abs(dense - dense.T).max() > 0.1


def test_kron_oracle_spin_half():
    ham = build_spin_orbital(4, 1)
    np.testing.assert_allclose(ham.to_dense(), _kron_oracle_half(4),
                               atol=1e-12)


def test_lanczos_vs_dense():
    ham = build_spin_orbital(3, 2)  # dim 729
    evals, _ = lz.lowest_states(ham, num_states=1, max_steps=200)
    e = np.linalg.eigvalsh(ham.to_dense())
    assert abs(float(evals[0]) - e[0]) < 1e-8


def test_cli(capsys):
    from lanczosplusplus_tpu.cli.spin_orbital_main import run
    e_lz, e_dense = run(["3", "2"])
    out = capsys.readouterr().out
    assert "Lanczos energy=" in out and "LAPACK energy=" in out
    assert abs(e_lz - e_dense) < 1e-7
