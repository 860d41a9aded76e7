"""FeAs extra interaction modes: naive reference transcriptions."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model


def feas_text(nsite, orbitals, mode, uvals, nup, ndown, extra=""):
    n2 = nsite * orbitals * 2
    conn = "\n".join(" ".join(["-1.0" if a == b else "0.3"
                               for b in range(orbitals)])
                     for a in range(orbitals))
    return f"""
TotalNumberOfSites={nsite}
Model=FeAsBasedSc
FeAsMode={mode}
NumberOfTerms=1
DegreesOfFreedom={orbitals}
Orbitals={orbitals}
GeometryKind=chain
GeometryOptions=ConstantValues
SolverOptions=none
hubbardU {len(uvals)} {" ".join(str(x) for x in uvals)}
Connectors {orbitals} {orbitals}
{conn}
potentialV {n2}
{" ".join(["0.1"] * n2)}
TargetElectronsUp={nup}
TargetElectronsDown={ndown}
IsPeriodicX=0
{extra}
"""


def bits_of(w, x):
    return (w >> x) & 1


def naive_impurity(model, basis):
    o = model.norb
    n = model.geometry.number_of_sites()
    u = model.u
    szu = basis.up.size
    dim = basis.size
    H = np.zeros((dim, dim))

    def count(w, lo, hi):
        return sum(bits_of(w, x) for x in range(lo, hi))

    def dosign(w, o1, o2):
        if o1 > o2:
            return -dosign(w, o2, o1)
        return -1 if count(w, o1, o2) & 1 else 1

    def rank(uw, dw):
        iu = int(basis.up.rank(np.array([uw], dtype=np.uint64))[0])
        idn = int(basis.down.rank(np.array([dw], dtype=np.uint64))[0])
        return iu + idn * szu

    for row in range(dim):
        k1 = int(basis.up.words[row % szu])
        k2 = int(basis.down.words[row // szu])
        s = 0.0
        # potential (all sites)
        for i in range(n):
            for orb in range(o):
                a = i * o + orb
                s += model.potential_v[i + orb * n] * bits_of(k1, a)
                s += model.potential_v[i + (orb + o) * n] * bits_of(k2, a)
        for orb in range(o):
            s += u[0] * bits_of(k1, orb) * bits_of(k2, orb)
            for orb2 in range(o):
                if orb == orb2:
                    continue
                s += 0.5 * u[1] * (bits_of(k1, orb) * bits_of(k1, orb2) +
                                   bits_of(k2, orb) * bits_of(k2, orb2))
                s += u[4] * bits_of(k1, orb) * bits_of(k2, orb2)
        H[row, row] += s
        # off-diagonal Jimpurity (FeBasedSc.h:744-783)
        for type_ in range(2):
            for o1 in range(o):
                for o2 in range(o):
                    if o1 == o2:
                        continue
                    o3 = o2 if type_ == 0 else o1
                    o4 = o1 if type_ == 0 else o2
                    if not bits_of(k2, o4):
                        continue
                    if bits_of(k2, o3):
                        continue
                    if not bits_of(k1, o2):
                        continue
                    if bits_of(k1, o1):
                        continue
                    b2 = (k2 ^ (1 << o4)) ^ (1 << o3)
                    b1 = (k1 ^ (1 << o2)) ^ (1 << o1)
                    x = dosign(k1, o1, o2) * dosign(k2, o3, o4)
                    H[row, rank(b1, b2)] += x * u[3]
    # hopping contributes nothing for a 1-site cluster
    return H


@pytest.mark.parametrize("nup,ndown", [(1, 1), (2, 1)])
def test_impurity_mode(nup, ndown):
    inp = parse_input(feas_text(1, 3, "INT_IMPURITY",
                                [1.2, 0.7, -0.3, -0.45], nup, ndown))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((nup, ndown))
    dense = model.hamiltonian(basis).to_dense()
    np.testing.assert_allclose(dense, dense.T, atol=1e-12)
    naive = naive_impurity(model, basis)
    np.testing.assert_allclose(dense, naive, atol=1e-12)


def test_kspace_mode_hermitian():
    inp = parse_input(feas_text(1, 4, "INT_KSPACE", [0.9], 2, 2))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((2, 2))
    dense = model.hamiltonian(basis).to_dense()
    np.testing.assert_allclose(dense, dense.T, atol=1e-12)
    # diagonal part: U0 * n_up_tot * n_dn_tot at site 0
    from lanczosplusplus_tpu.core import bits as B
    for row in range(basis.size):
        k1 = int(basis.up.words[row % basis.up.size])
        k2 = int(basis.down.words[row // basis.up.size])
        pot = 0.1 * (bin(k1).count("1") + bin(k2).count("1"))
        expect = 0.9 * bin(k1).count("1") * bin(k2).count("1") + pot
        assert dense[row, row] == pytest.approx(expect, abs=1e-12)


def test_int_v_mode_diag():
    uvals = [1.0, 0.2, 0.3,
             0.2, 0.8, 0.1,
             0.3, 0.1, 0.6]
    inp = parse_input(feas_text(2, 3, "INT_V", uvals, 2, 2,
                                extra="CoulombV=0.0"))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((2, 2))
    dense = model.hamiltonian(basis).to_dense()
    np.testing.assert_allclose(dense, dense.T, atol=1e-12)
    u = np.array(uvals).reshape(3, 3).T  # u[orb + orb2*o]
    # check one diagonal entry by hand
    row = 0
    k1 = int(basis.up.words[0])
    k2 = int(basis.down.words[0])
    s = 0.0
    o = 3
    for i in range(2):
        for orb in range(o):
            a = i * o + orb
            s += 0.1 * (bits_of(k1, a) + bits_of(k2, a))
            s += u[orb, orb] * bits_of(k1, a) * bits_of(k2, a)
            for orb2 in range(orb + 1, o):
                b = i * o + orb2
                na = bits_of(k1, a) + bits_of(k2, a)
                nb = bits_of(k1, b) + bits_of(k2, b)
                s += u[orb, orb2] * na * nb
    assert dense[0, 0] == pytest.approx(s, abs=1e-12)
