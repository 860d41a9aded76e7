"""Heisenberg model golden tests: dense oracle + literature values +
Lehmann spectral checks."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine import Engine
from lanczosplusplus_tpu.solver import lanczos as lz


def heis_input(nsite, twice_s, szpc, j=1.0, periodic=1, extra=""):
    return f"""
TotalNumberOfSites={nsite}
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {j}
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {j}
Model=Heisenberg
HeisenbergTwiceS={twice_s}
SolverOptions=none
TargetSzPlusConst={szpc}
IsPeriodicX={periodic}
{extra}
"""


def brute_heisenberg_dense(nsite, twice_s, szpc, jmat_pm, jmat_zz,
                           bfield=None, aniso=None):
    """Independent dense construction from spin matrices via kron."""
    d = twice_s + 1
    s = 0.5 * twice_s
    m = np.arange(d) - s
    sz = np.diag(m)
    sp = np.zeros((d, d))
    for k in range(d - 1):
        # raise from m[k] to m[k+1]
        sp[k + 1, k] = np.sqrt(s * (s + 1) - m[k] * (m[k] + 1))
    sm = sp.T

    def site_op(op, i):
        mats = [np.eye(d)] * nsite
        mats[i] = op
        out = mats[0]
        # site 0 is the lowest bit: kron order reversed (site i varies
        # fastest): use standard kron with site nsite-1 outermost
        for k in range(1, nsite):
            out = np.kron(mats[k], out)
        return out

    dim = d ** nsite
    H = np.zeros((dim, dim))
    for i in range(nsite):
        if bfield is not None and i < len(bfield):
            H += bfield[i] * site_op(sz, i)
        if aniso is not None and i < len(aniso):
            H += aniso[i] * site_op(sz, i) @ site_op(sz, i)
        for jj in range(i + 1, nsite):
            if jmat_zz[i, jj]:
                H += jmat_zz[i, jj] * site_op(sz, i) @ site_op(sz, jj)
            if jmat_pm[i, jj]:
                H += 0.5 * jmat_pm[i, jj] * (
                    site_op(sp, i) @ site_op(sm, jj) +
                    site_op(sm, i) @ site_op(sp, jj))
    # project to the sum(val) == szpc sector, ordered by word value
    # (site digit = val, site 0 least significant)
    vals = np.zeros((dim, nsite), dtype=int)
    t = np.arange(dim)
    for i in range(nsite):
        vals[:, i] = t % d
        t = t // d
    keep = np.where(vals.sum(axis=1) == szpc)[0]
    return H[np.ix_(keep, keep)], keep


def test_dense_oracle_s_half():
    nsite = 6
    inp = parse_input(heis_input(nsite, 1, 3))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((1, 3))
    ham = model.hamiltonian(basis)
    dense = ham.to_dense()
    np.testing.assert_allclose(dense, dense.T, atol=1e-13)
    brute, keep = brute_heisenberg_dense(
        nsite, 1, 3, geom.coupling_matrix(0), geom.coupling_matrix(1))
    # same state ordering: words ascending == keep ascending for 1 bit
    np.testing.assert_allclose(dense, brute, atol=1e-12)


def test_dense_oracle_spin_one_with_fields():
    nsite = 4
    extra = "MagneticField 4 0.3 -0.1 0.0 0.2\nAnisotropyD 4 0.5 0.5 0.5 0.5"
    inp = parse_input(heis_input(nsite, 2, 4, j=0.9, periodic=0,
                                 extra=extra))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((2, 4))
    ham = model.hamiltonian(basis)
    dense = ham.to_dense()
    brute, keep = brute_heisenberg_dense(
        nsite, 2, 4, geom.coupling_matrix(0), geom.coupling_matrix(1),
        bfield=[0.3, -0.1, 0.0, 0.2], aniso=[0.5] * 4)
    np.testing.assert_allclose(dense, brute, atol=1e-12)


def test_heisenberg_12_site_chain_energy():
    """12-site PBC S=1/2 chain: E0 known from exact diagonalization."""
    inp = parse_input(heis_input(12, 1, 6))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    assert eng.basis.size == 924
    assert eng.ground_energy == pytest.approx(-5.387390917445, abs=1e-8)


def test_heisenberg_szsz_spectral_lehmann():
    nsite = 6
    inp = parse_input(heis_input(nsite, 1, 3, periodic=1))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    coll, labels = eng.spectral_function("sz", 2, 2, spin=0)
    omegas = np.linspace(-4, 4, 61)
    delta = 0.12
    got = coll.evaluate(omegas, delta)
    # Lehmann: sum_n |<n|Sz_2|gs>|^2 [1/(z-(En-E0)) - 1/(z+(En-E0))]
    # NOTE: the reference's labeled "sz" matrix element is val - S
    dense = eng.hamiltonian.to_dense()
    evals, evecs = np.linalg.eigh(dense)
    gs = evecs[:, 0]
    m2 = eng.basis.digits[:, 2].astype(float) - 0.5
    sz_gs = m2 * gs
    amps = evecs.T @ sz_gs
    z = omegas + 1j * delta
    expect = np.zeros_like(z)
    for n in range(len(evals)):
        w = amps[n] ** 2
        expect += w / (z - (evals[n] - evals[0]))
        expect -= w / (z + (evals[n] - evals[0]))
    np.testing.assert_allclose(got, expect, atol=1e-8)


def test_heisenberg_splus_spectral_crosses_sector():
    """splus spectral function: sectors szpc +- 1, vs Lehmann."""
    nsite = 6
    inp = parse_input(heis_input(nsite, 1, 3))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    coll, labels = eng.spectral_function("splus", 1, 1, spin=0)
    omegas = np.linspace(-5, 5, 41)
    delta = 0.15
    got = coll.evaluate(omegas, delta)

    dense0 = eng.hamiltonian.to_dense()
    e0s, v0s = np.linalg.eigh(dense0)
    gs = v0s[:, 0]
    z = omegas + 1j * delta
    expect = np.zeros_like(z)
    from lanczosplusplus_tpu.engine.operators import LabeledOperator
    # type 0 applies tc(splus)=sminus into szpc-1 with sigma=+1 weight +
    # type 1 applies splus into szpc+1 with sigma=-1, weight -w (bosonic)
    for op_name, sigma, wsign in (("sminus", +1, +1), ("splus", -1, -1)):
        op = LabeledOperator(op_name)
        parts_new = model.has_new_parts((1, 3), op, 0, 0)
        if parts_new is None:
            continue
        bas = model.create_basis(parts_new)
        tgt, amp, dst = model.operator_map(op, 1, 0, 0, eng.basis, bas)
        phi = np.zeros(dst)
        mask = tgt >= 0
        np.add.at(phi, tgt[mask], amp[mask] * gs[mask])
        h = model.hamiltonian(bas).to_dense()
        es, vs = np.linalg.eigh(h)
        a = vs.T @ phi
        for n in range(len(es)):
            expect += wsign * a[n] ** 2 / (z - sigma * (es[n] - e0s[0]))
    np.testing.assert_allclose(got, expect, atol=1e-8)


def test_lanczos_large_sector():
    """16-site S=1/2 chain (dim 12870) Lanczos vs known dense value."""
    inp = parse_input(heis_input(16, 1, 8))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    assert eng.basis.size == 12870
    # independent solver oracle: scipy ARPACK on the same matvec
    import scipy.sparse.linalg as spla
    ham = eng.hamiltonian
    op = spla.LinearOperator(
        (ham.dim, ham.dim),
        matvec=lambda v: np.asarray(ham.matvec(v)))
    e_arpack = spla.eigsh(op, k=1, which="SA",
                          return_eigenvectors=False)[0]
    assert eng.ground_energy == pytest.approx(e_arpack, abs=1e-9)


def test_heisenberg_batched_spectral_matches_serial():
    """Batched CF fleet: non-fermionic sector-changing (splus) and
    diagonal (sz) operators, off-diagonal pairs included."""
    nsite = 6
    inp = parse_input(heis_input(nsite, 1, 3, periodic=1))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    omegas = np.linspace(-5, 5, 61)
    delta = 0.13
    for op in ("sz", "splus"):
        pairs = [(0, 0), (1, 4), (2, 2)]
        outs = eng.spectral_functions_batched(op, pairs, spin=0)
        for (i, j), (coll, labels) in zip(pairs, outs):
            scoll, slabels = eng.spectral_function(op, i, j, spin=0)
            assert labels == slabels
            np.testing.assert_allclose(
                coll.evaluate(omegas, delta),
                scoll.evaluate(omegas, delta), atol=1e-8)
