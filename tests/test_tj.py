"""t-J model tests: brute-force oracle in the constrained space,
Heisenberg limit at half filling, spectral function across sectors."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine import Engine


def tj_input(nsite, nup, ndown, t=-1.0, j=0.3, w=0.0, periodic=0):
    def term(v):
        return f"""DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {v}
"""
    return (f"TotalNumberOfSites={nsite}\nNumberOfTerms=4\n"
            + term(t) + term(j) + term(j) + term(w)
            + f"""Model=TjMultiOrb
Orbitals=1
potentialV {2 * nsite} {" ".join(["0"] * 2 * nsite)}
SolverOptions=none
TargetElectronsUp={nup}
TargetElectronsDown={ndown}
IsPeriodicX={periodic}
""")


def test_tj_half_filling_equals_heisenberg():
    """At half filling the t-J chain with jpm=jzz=J reduces to the
    Heisenberg chain (up to the W ninj constant)."""
    nsite = 8
    inp = parse_input(tj_input(nsite, 4, 4, t=-1.0, j=0.77, periodic=1))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    assert eng.basis.size == 70  # C(8,4): no holes
    # Heisenberg PBC J=0.77, 8 sites: E0 = 0.77 * (-3.651093408937176)
    assert eng.ground_energy == pytest.approx(
        0.77 * -3.651093408937176, abs=1e-9)


def test_tj_dense_oracle_with_holes():
    """6 sites, 2 up + 2 down (2 holes): compare against a brute-force
    projected-Hubbard-style construction of the t-J Hamiltonian."""
    nsite = 6
    inp = parse_input(tj_input(nsite, 2, 2, t=-1.0, j=0.4, w=-0.1))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((2, 2))
    ham = model.hamiltonian(basis)
    dense = ham.to_dense()
    np.testing.assert_allclose(dense, dense.T, atol=1e-13)

    brute = brute_tj(nsite, basis, geom.coupling_matrix(0),
                     geom.coupling_matrix(1), geom.coupling_matrix(2),
                     geom.coupling_matrix(3))
    np.testing.assert_allclose(dense, brute, atol=1e-12)


def brute_tj(nsite, basis, tmat, jpm, jzz, wmat):
    """Slow loop construction with standard fermion-string conventions
    (up modes before down modes)."""
    dim = basis.size
    index = {(int(u), int(d)): k
             for k, (u, d) in enumerate(zip(basis.up_words, basis.dn_words))}
    H = np.zeros((dim, dim))

    def sgn_below(w, i):
        return -1 if bin(w & ((1 << i) - 1)).count("1") & 1 else 1

    for (u, d), row in index.items():
        nu = [(u >> i) & 1 for i in range(nsite)]
        nd = [(d >> i) & 1 for i in range(nsite)]
        diag = 0.0
        for i in range(nsite):
            for j in range(i + 1, nsite):
                diag += 0.25 * jzz[i, j] * (nu[i] - nd[i]) * (nu[j] - nd[j])
                diag += wmat[i, j] * (nu[i] + nd[i]) * (nu[j] + nd[j])
        H[row, row] += diag
        for i in range(nsite):
            for j in range(nsite):
                if i == j or tmat[i, j] == 0:
                    continue
                # c^dag_j c_i up, destination must stay singly occupied
                if nu[i] == 1 and nu[j] == 0 and nd[j] == 0:
                    s = sgn_below(u, i)
                    u1 = u ^ (1 << i)
                    s *= sgn_below(u1, j)
                    col = index[(u1 ^ (1 << j), d)]
                    H[row, col] += tmat[i, j] * s
                if nd[i] == 1 and nd[j] == 0 and nu[j] == 0:
                    s = sgn_below(d, i)
                    d1 = d ^ (1 << i)
                    s *= sgn_below(d1, j)
                    col = index[(u, d1 ^ (1 << j))]
                    H[row, col] += tmat[i, j] * s
                # S+_i S-_j with J/2 per direction
                if jpm[i, j] != 0 and nu[j] == 1 and nu[i] == 0 and \
                        nd[i] == 1 and nd[j] == 0:
                    # S+_i S-_j = c^dag_iu c_id c^dag_jd c_ju applied
                    # right to left: c_ju, then c^dag_jd (on the
                    # original d), then c_id (j > or < i handled by the
                    # updated word), then c^dag_iu; cross-spin crossing
                    # factors cancel
                    s = sgn_below(u, j)
                    u1 = u ^ (1 << j)
                    s *= sgn_below(d, j)
                    d1 = d | (1 << j)
                    s *= sgn_below(d1, i)
                    d2 = d1 ^ (1 << i)
                    s *= sgn_below(u1, i)
                    u2 = u1 ^ (1 << i)
                    col = index[(u2, d2)]
                    H[row, col] += 0.5 * jpm[i, j] * s
    return H


def test_tj_gf_spectral_lehmann():
    """One-particle Green's function on the t-J chain vs Lehmann."""
    nsite = 6
    inp = parse_input(tj_input(nsite, 2, 2, t=-1.0, j=0.4))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    coll, labels = eng.spectral_function("c", 1, 1, spin=0)
    omegas = np.linspace(-5, 5, 41)
    delta = 0.15
    got = coll.evaluate(omegas, delta)
    # Lehmann via operator_map (independent of the CF machinery)
    from lanczosplusplus_tpu.engine.operators import LabeledOperator
    dense0 = eng.hamiltonian.to_dense()
    e0s, v0s = np.linalg.eigh(dense0)
    gs = v0s[:, 0]
    z = omegas + 1j * delta
    expect = np.zeros_like(z)
    for op_name, sigma in (("cdagger", +1), ("c", -1)):
        op = LabeledOperator(op_name)
        parts_new = model.has_new_parts((2, 2), op, 0, 0)
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
            expect += a[n] ** 2 / (z - sigma * (es[n] - e0s[0]))
    np.testing.assert_allclose(got, expect, atol=1e-8)


def test_tj_gs_vs_arpack():
    """16-site t-J chain sector vs ARPACK oracle (config 2 scale)."""
    inp = parse_input(tj_input(12, 5, 5, t=-1.0, j=0.3, periodic=1))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    import scipy.sparse.linalg as spla
    ham = eng.hamiltonian
    op = spla.LinearOperator((ham.dim, ham.dim),
                             matvec=lambda v: np.asarray(ham.matvec(v)))
    e = spla.eigsh(op, k=1, which="SA", return_eigenvectors=False)[0]
    assert eng.ground_energy == pytest.approx(e, abs=1e-8)


def test_jhund_infinity_rotation():
    """JHundInfinity=1 for a 2-site 2-orbital t-J: the rotated+truncated
    Hamiltonian is hermitian and its spectrum is a subset consistent
    with projecting out per-site code-6 combos."""
    def term(v):
        return f"""DegreesOfFreedom=2
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 2 2
{v} 0.0
0.0 {v}
"""
    text = (f"TotalNumberOfSites=2\nNumberOfTerms=4\n"
            + term(-1.0) + term(0.4) + term(0.4) + term(-0.1)
            + """Model=TjMultiOrb
Orbitals=2
JHundInfinity=1
potentialV 8 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=1
TargetElectronsDown=1
IsPeriodicX=0
""")
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((1, 1))
    ham = model.hamiltonian(basis)
    assert ham.dim < basis.size  # truncation happened
    dense = ham.to_dense()
    np.testing.assert_allclose(dense, dense.T, atol=1e-10)
    # untruncated spectrum for comparison: rotation alone is unitary,
    # so without truncation spectra would match; with truncation the
    # remaining eigenvalues interlace the full ones
    model2 = build_model(parse_input(text.replace("JHundInfinity=1",
                                                  "JHundInfinity=0")),
                         geom)
    full = np.linalg.eigvalsh(model2.hamiltonian(basis).to_dense())
    trunc = np.linalg.eigvalsh(dense)
    assert trunc[0] >= full[0] - 1e-10  # Cauchy interlacing lower bound


def test_tj_chain_one_particle_gf_sum_rule():
    """BASELINE config 3 (reduced for CPU test time; the 16-site run is
    benchmarks/tj_gf.py): t-J chain one-particle G(omega) via continued
    fractions; validated by the anticommutator sum rule and spectral
    positivity."""
    inp = parse_input(tj_input(14, 6, 6, t=-1.0, j=0.35, periodic=1))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    assert eng.basis.size == 84084
    coll, labels = eng.spectral_function("c", 0, 0, spin=0)
    # sum of |phi|^2 weights: <c c^dag> + <c^dag c> = 1 in the
    # constrained space minus double-occupancy exclusion corrections;
    # for t-J: {c,c^dag}_projected <= 1, and n_up + (1 - n_up - n_dn)
    total_w = sum(abs(cf.weight) for cf in coll.items)
    assert 0.5 < total_w <= 1.0 + 1e-9
    omegas = np.linspace(-6, 6, 241)
    g = coll.evaluate(omegas, 0.1)
    assert (-g.imag >= -1e-9).all()  # positive spectral function
    # integral matches total weight within broadening tails
    integ = np.trapezoid(-g.imag / np.pi, omegas)
    assert integ == pytest.approx(total_w, abs=0.08)


def test_tj_measure_rahul():
    """rahul-method measure on the constrained t-J basis: double
    occupancy is identically zero; <n_up(0)> matches dense."""
    inp = parse_input(tj_input(6, 2, 2, t=-1.0, j=0.4))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    docc = eng.measure("gs|n[0];n?1[0]|gs")
    assert abs(docc) < 1e-12  # no double occupancy in t-J
    nup0 = eng.measure("gs|n[0]|gs").real
    gs = np.asarray(eng.eigenvector(0))
    from lanczosplusplus_tpu.core import bits as B
    occ = B.get_bit(eng.basis.up_words, 0)
    expect = float(np.sum(np.abs(gs) ** 2 * occ))
    assert nup0 == pytest.approx(expect, abs=1e-10)
